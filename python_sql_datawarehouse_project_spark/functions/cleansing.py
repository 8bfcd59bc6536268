"""Column-level cleansing rules R1-R8 (SURVEY.md §2.8).

Each function is a pure Column->Column (or Columns->Column)
expression, JVM-evaluated inside whole-stage codegen — no UDFs.  The
semantics are an exact reproduction of the reference's silver procs,
including the permissive corner cases SURVEY.md §7 calls out (R2 uses
ABS(price) while R3 divides ABS(sales) by *raw* quantity; R4 accepts
length-8 strings only).

Citations point into /root/reference/sql/tools/Procedure/client1/.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# -- R8 decode maps ---------------------------------------------------
def decode_marital_status(col: Column) -> Column:
    """tools.load_crm_cust_info_v1.sql:82-86 — M/S -> Married/Single."""
    u = F.upper(F.trim(col))
    return (
        F.when(u == "M", "Married").when(u == "S", "Single").otherwise("Unknown")
    )


def decode_gender_crm(col: Column) -> Column:
    """tools.load_crm_cust_info_v1.sql:87-91 — F/M -> Female/Male."""
    u = F.upper(F.trim(col))
    return F.when(u == "F", "Female").when(u == "M", "Male").otherwise("Unknown")


def decode_gender_erp(col: Column) -> Column:
    """tools.load_erp_cust_az12_v1.sql:80-84 — F/FEMALE, M/MALE."""
    u = F.upper(F.trim(col))
    return (
        F.when(u.isin("F", "FEMALE"), "Female")
        .when(u.isin("M", "MALE"), "Male")
        .otherwise("Unknown")
    )


def decode_product_line(col: Column) -> Column:
    """tools.load_crm_prd_info_v1.sql:83-89 — M/S/R/T decode."""
    u = F.upper(F.trim(col))
    return (
        F.when(u == "M", "Mountain")
        .when(u == "S", "Sport")
        .when(u == "R", "Road")
        .when(u == "T", "Touring")
        .otherwise("Unknown")
    )


def decode_country(col: Column) -> Column:
    """tools.load_erp_loc_a101_v1.sql:72-77 — DE/US/USA/blank decode."""
    t = F.trim(col)
    return (
        F.when(t == "DE", "Germany")
        .when(t.isin("US", "USA"), "United States")
        .when((t == "") | col.isNull(), "Unknown")
        .otherwise(t)
    )


# -- R7 key canonicalization -----------------------------------------
def strip_nas_prefix(cid: Column) -> Column:
    """tools.load_erp_cust_az12_v1.sql:72-75 — CID LIKE 'NAS%' ->
    SUBSTRING(cid, 4)."""
    return F.when(
        cid.startswith("NAS"), cid.substr(F.lit(4), F.length(cid))
    ).otherwise(cid)


def strip_dashes(cid: Column) -> Column:
    """tools.load_erp_loc_a101_v1.sql:71 — TRIM(REPLACE(cid,'-',''))."""
    return F.trim(F.translate(cid, "-", ""))


def split_cat_id(prd_key: Column) -> Column:
    """tools.load_crm_prd_info_v1.sql:79 —
    TRIM(REPLACE(substring(prd_key, 1, 5), '-', '_'))."""
    return F.trim(F.translate(F.substring(prd_key, 1, 5), "-", "_"))


def split_prd_key(prd_key: Column) -> Column:
    """tools.load_crm_prd_info_v1.sql:80 —
    TRIM(substring(prd_key, 7, LENGTH(prd_key)))."""
    return F.trim(prd_key.substr(F.lit(7), F.length(prd_key)))


# -- R4 yyyymmdd sanitization ----------------------------------------
def parse_yyyymmdd(col: Column) -> Column:
    """tools.load_crm_sales_details_v1.sql:81-95 — 0 or length != 8
    -> NULL, else parse the integer as a yyyyMMdd date."""
    s = col.cast("string")
    return F.when(
        (col == 0) | (F.length(s) != 8), F.lit(None).cast("date")
    ).otherwise(F.to_date(s, "yyyyMMdd"))


# -- R2 sales consistency repair -------------------------------------
def repair_sales(sales: Column, quantity: Column, price: Column) -> Column:
    """tools.load_crm_sales_details_v1.sql:96-102 — null/<=0/inconsistent
    sales recomputed as quantity * ABS(price)."""
    expected = quantity * F.abs(price)
    return F.when(
        sales.isNull() | (sales <= 0) | (sales != expected), expected
    ).otherwise(sales)


# -- R3 price derivation ---------------------------------------------
def repair_price(sales: Column, quantity: Column, price: Column) -> Column:
    """tools.load_crm_sales_details_v1.sql:104-109 — null/<=0 price ->
    ABS(sales) / NULLIF(quantity, 0).  NOTE: uses the ORIGINAL sales
    column (not the R2-repaired one), exactly like the proc, where both
    CASEs read the raw row."""
    return F.when(
        price.isNull() | (price <= 0),
        F.abs(sales) / F.nullif(quantity, F.lit(0)),
    ).otherwise(price)


# -- R5 future-birthdate null ----------------------------------------
def null_future_date(col: Column) -> Column:
    """tools.load_erp_cust_az12_v1.sql:76-79 — bdate > CURRENT_DATE -> NULL."""
    return F.when(col > F.current_date(), F.lit(None).cast("date")).otherwise(col)


# -- R6 future create-date clamp -------------------------------------
def clamp_future_year(col: Column) -> Column:
    """tools.load_crm_cust_info_v1.sql:92-100 — year > current year ->
    same month/day with the current year."""
    return F.when(
        F.year(col) > F.year(F.current_date()),
        F.make_date(F.year(F.current_date()), F.month(col), F.dayofmonth(col)),
    ).otherwise(col)


# -- R1 gender integration (gold) ------------------------------------
def integrate_gender(crm_gender: Column, erp_gender: Column) -> Column:
    """tools.load_dim_customers_v1.sql:68-71 — CRM wins unless
    'Unknown', else ERP, else 'Unknown'."""
    return F.when(crm_gender != "Unknown", crm_gender).otherwise(
        F.coalesce(erp_gender, F.lit("Unknown"))
    )
