"""Minimal stdlib .xlsx reader (S2 fallback engine).

The reference really reads Excel landing files
(handlers/convert_to_parquet.py:186, `pd.read_excel(src,
sheet_name=0)`), but this environment ships neither openpyxl nor
xlrd.  An .xlsx file is a ZIP of small XML parts, so a first-sheet
read needs only zipfile + ElementTree: workbook.xml names the sheets,
workbook.xml.rels maps the first sheet to its worksheet part,
sharedStrings.xml holds the interned strings, and sheetData rows
carry typed cells.

Fidelity scope (documented, matching the landing-file contract):
  * first sheet only, row 1 = header (pandas read_excel defaults);
  * cell types: shared strings (t="s"), inline strings
    (t="inlineStr"), formula-cached strings (t="str"), booleans
    (t="b"), numbers (everything else; int when integral);
  * NOT handled: date-style numbers stay raw serial numbers (style
    tables are not consulted), merged cells, formulas re-evaluation.

Driver-side by design, like the reference's pandas conversion: xlsx
files are small pre-ingest landing files, never warehouse-scale data.
The Spark path (createDataFrame -> bronze parquet) is unchanged.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27."""
    m = _CELL_REF.match(ref)
    if not m:
        raise ValueError(f"bad cell reference {ref!r}")
    n = 0
    for ch in m.group(1):
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _text_of(el) -> str:
    """Concatenated <t> runs under a node (plain or rich-text <si>)."""
    return "".join(t.text or "" for t in el.iter() if t.tag.endswith("}t"))


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    return [_text_of(si) for si in root if si.tag.endswith("}si")]


def _first_sheet_part(zf: zipfile.ZipFile) -> str:
    """Resolve the first sheet (workbook order) to its worksheet part
    path via the workbook relationships."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = [el for el in wb.iter() if el.tag.endswith("}sheet")]
    if not sheets:
        raise ValueError("workbook has no sheets")
    rid = next(v for k, v in sheets[0].attrib.items() if k.endswith("}id"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target = next(
        rel.attrib["Target"]
        for rel in rels
        if rel.attrib.get("Id") == rid
    )
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_value(cell, shared: list[str]):
    ctype = cell.attrib.get("t", "n")
    if ctype == "inlineStr":
        return _text_of(cell)
    v = next((c for c in cell if c.tag.endswith("}v")), None)
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text == "1"
    num = float(v.text)
    return int(num) if num.is_integer() else num


def read_first_sheet(path: str) -> tuple[list[str], list[list]]:
    """(header, data_rows) of the first worksheet; row 1 is the
    header, later rows are padded/truncated to the header width with
    None for absent cells."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(_first_sheet_part(zf)))
        rows: dict[int, dict[int, object]] = {}
        for row in sheet.iter():
            if not row.tag.endswith("}row"):
                continue
            rnum = int(row.attrib["r"])
            cells = rows.setdefault(rnum, {})
            for ci, cell in enumerate(c for c in row if c.tag.endswith("}c")):
                idx = (
                    _col_index(cell.attrib["r"]) if "r" in cell.attrib else ci
                )
                cells[idx] = _cell_value(cell, shared)
    if not rows:
        return [], []
    order = sorted(rows)
    header_cells = rows[order[0]]
    width = max(header_cells) + 1
    header = [str(header_cells.get(i, f"col{i}")) for i in range(width)]
    data = [
        [rows[r].get(i) for i in range(width)] for r in order[1:]
    ]
    return header, data
