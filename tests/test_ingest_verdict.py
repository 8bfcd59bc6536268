"""ix1_ingest_verdict: the composed per-ingest verdict's seams pinned
against the components it composes (VERDICT r8 #4).

The gate's DuckDB oracle (driver + sweeps) proves the composition
end-to-end; these tests pin the two internal seams to their
already-green building blocks, so a future refactor of either side
cannot silently fork semantics:

  screen stage   == BloomIndex (persisted) probe of the same grams
  dedup stage    == dd11's asymmetric probe, restricted to the roles
                    ix1 defines (bench docs out, contaminated out)

plus the action partition law every downstream scheduler relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_sql_datawarehouse_project_spark.catalog import load_table
from python_sql_datawarehouse_project_spark.operators.incremental import (
    _is_new,
    dd11_incremental_lsh,
)
from python_sql_datawarehouse_project_spark.operators.ingest_verdict import (
    ix1_ingest_verdict,
)
from python_sql_datawarehouse_project_spark.operators.text import (
    BENCH_MOD,
    _doc_grams,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def verdict(spark):
    return {tuple(r) for r in ix1_ingest_verdict(spark, SF).collect()}


def test_screen_matches_persisted_bloom_index(spark, tmp_path, verdict):
    """Inline screen == BloomIndex built on the benchmark role and
    probed with the batch role's grams (the persisted path a
    deployment runs)."""
    from python_sql_datawarehouse_project_spark.plans.bloom_index import (
        BloomIndex,
    )
    from python_sql_datawarehouse_project_spark.plans.warehouse import (
        Warehouse,
    )

    docs = load_table(spark, SF, "documents")
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    grams = _doc_grams(docs)
    idx = BloomIndex(Warehouse(spark, str(tmp_path / "wh")))
    idx.build(spark, grams.where(is_bench).select("h").distinct(), "base")
    probed = {
        (r["doc_id"], r["n_grams"], r["n_bloom_hits"])
        for r in idx.probe(
            spark, grams.where(~is_bench & _is_new(F.col("doc_id")))
        ).collect()
    }
    inline = {
        (d, g, h) for d, g, h, *_ in verdict if g > 0
    }  # probe only sees docs WITH grams; ix1 adds gramless rows as 0/0
    assert probed == inline


def test_dedup_stage_matches_dd11_restricted(spark, verdict):
    """ix1's duplicate counts == dd11's asymmetric new-vs-corpus
    matches, restricted to ix1's roles: benchmark docs excluded from
    BOTH sides, contaminated batch docs never probed."""
    surviving = {d for d, g, h, *_ in verdict if h == 0}
    dd11 = (
        dd11_incremental_lsh(spark, SF)
        .where(
            (F.col("new_doc_id") % BENCH_MOD != 0)
            & (F.col("corpus_doc_id") % BENCH_MOD != 0)
        )
        .collect()
    )
    counts: dict[int, int] = {}
    best: dict[int, tuple] = {}
    for r in dd11:
        if r["new_doc_id"] not in surviving:
            continue
        counts[r["new_doc_id"]] = counts.get(r["new_doc_id"], 0) + 1
        key = (-r["jaccard"], r["corpus_doc_id"])
        if r["new_doc_id"] not in best or key < best[r["new_doc_id"]][0]:
            best[r["new_doc_id"]] = (key, r["corpus_doc_id"])
    got = {
        (d, n, c)
        for d, g, h, n, c, a in verdict
        if h == 0 and n > 0
    }
    want = {(d, n, best[d][1]) for d, n in counts.items()}
    assert got == want


def test_action_partition_law(spark, verdict):
    """Every row lands in exactly the action its counters dictate, and
    the canonical pointer exists iff the row is a duplicate drop."""
    assert verdict, "batch role is empty at sf0.001 — split broke"
    seen = set()
    for doc_id, n_grams, n_hits, n_dups, canonical, action in verdict:
        seen.add(action)
        if n_hits > 0:
            assert action == "drop_contaminated" and n_dups == 0
        elif n_dups > 0:
            assert action == "drop_duplicate" and canonical is not None
        else:
            assert action == "keep" and canonical is None
        assert n_grams >= 0 and n_hits <= n_grams
    assert "keep" in seen  # a screen that drops everything is a bug


# -- ix2: the embedding-side verdict ----------------------------------
@pytest.fixture(scope="module")
def verdict2(spark):
    from python_sql_datawarehouse_project_spark.operators.ingest_verdict import (
        ix2_embedding_ingest_verdict,
    )

    return {tuple(r) for r in ix2_embedding_ingest_verdict(spark, SF).collect()}


def test_ix2_dedup_stage_matches_dd14_restricted(spark, verdict2):
    """ix2's corpus-dup counts == dd14's auto-banded pair gate output
    restricted to ix2's roles (one side a surviving batch vector, the
    other a corpus vector) — the same banding, the same rescore, so
    the asymmetric probe must be exactly the role-filtered slice of
    the symmetric gate.  (ix2 additionally occupancy-caps the corpus
    bands — dd16's policy — but at sf0.001 no bucket exceeds AUTO_OCC,
    so below the cap the sets are identical, the same
    below-the-cap==uncapped convention dd17 pins at this SF.)"""
    from python_sql_datawarehouse_project_spark.operators.dedup import (
        dd14_lsh_autosized,
    )
    from python_sql_datawarehouse_project_spark.operators.incremental import (
        NEW_MOD,
    )
    surviving = {v for v, eh, *_ in verdict2 if eh == 0}

    def role(vec_id: int) -> str:
        import hashlib

        if vec_id % BENCH_MOD == 0:
            return "eval"
        h = int(hashlib.md5(str(vec_id).encode()).hexdigest()[:15], 16)
        return "new" if h % NEW_MOD == 0 else "corpus"

    counts: dict[int, int] = {}
    best: dict[int, tuple] = {}
    for r in dd14_lsh_autosized(spark, SF).collect():
        for v, o in ((r["vec_a"], r["vec_b"]), (r["vec_b"], r["vec_a"])):
            if v in surviving and role(o) == "corpus":
                counts[v] = counts.get(v, 0) + 1
                key = (-r["cosine"], o)
                if v not in best or key < best[v][0]:
                    best[v] = (key, o)
    got = {(v, n, c) for v, eh, n, c, a in verdict2 if eh == 0 and n > 0}
    want = {(v, n, best[v][1]) for v, n in counts.items()}
    assert got == want


def test_ix2_action_partition_law(spark, verdict2):
    assert verdict2, "batch role is empty at sf0.001 — split broke"
    for vec_id, n_eval, n_dups, canonical, action in verdict2:
        if n_eval > 0:
            assert action == "drop_contaminated" and n_dups == 0
        elif n_dups > 0:
            assert action == "drop_duplicate" and canonical is not None
        else:
            assert action == "keep" and canonical is None
    assert any(a == "keep" for *_, a in verdict2)
