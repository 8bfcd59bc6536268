"""mode="incremental_approx": CLV's customer-grain HLL state
(VERDICT r9 #4).  Exact mode stays bitwise-pinned elsewhere
(test_mv_incremental.py); here the contract is (a) lifetime_value is
STILL exact, (b) order_count's estimate error is bounded, (c) the
register state merges across batches like every partial, and (d) the
pipeline wiring routes only CLV through the approx path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_sql_datawarehouse_project_spark.plans import mv_incremental as mi
from python_sql_datawarehouse_project_spark.plans.warehouse import Warehouse
from tests.test_mv_incremental import B1, B2, _seed_gold


@pytest.fixture(scope="module")
def approx_wh(spark, tmp_path_factory):
    wh = Warehouse(spark, str(tmp_path_factory.mktemp("approxwh")))
    _seed_gold(spark, wh)
    name = "mv_customer_lifetime_value"
    mi.refresh_mv_incremental_approx(wh, name, B1)
    mi.refresh_mv_incremental_approx(wh, name, B2, prev_batch_id=B1)
    return wh


def test_lifetime_value_stays_exact(approx_wh):
    got = {
        (r["customer_id"], r["lifetime_value"])
        for r in approx_wh.read_batch(
            "mv", "mv_customer_lifetime_value", B2
        ).collect()
    }
    # money routes through the same decimal policy as the exact mode:
    # Ann 100+50+30 across batches, Bob 70, Cyd 80
    assert got == {(100, 180.0), (101, 70.0), (102, 80.0)}


def test_order_count_exact_at_tiny_cardinality(approx_wh):
    """With 1 distinct order per customer, LinearCounting is exact
    after rounding — a seeded-oracle floor under the error bound."""
    got = {
        (r["customer_id"], r["order_count"])
        for r in approx_wh.read_batch(
            "mv", "mv_customer_lifetime_value", B2
        ).collect()
    }
    assert got == {(100, 1), (101, 1), (102, 1)}


def test_state_is_customer_grain(approx_wh):
    state = approx_wh.read_batch(
        mi.STATE_LAYER, mi._HLL_STATE, B2
    )
    rows = state.collect()
    assert len(rows) == 3  # one row per customer, never per order
    assert all(len(r["regs"]) == 64 for r in rows)


def test_estimate_error_bounded_at_scale(spark, sf_dir, tmp_path):
    """Synthetic wide case: customers with up to ~200 distinct orders
    through one gold batch.  HLL(m=64) + LinearCounting must land
    within 2 * (1.04/sqrt(64)) = 26% relative error on EVERY customer
    (2 sigma of the standard HLL bound), and within 5% on the total."""
    import datetime as dt

    wh = Warehouse(spark, str(tmp_path / "wh"))
    d = dt.date(2024, 1, 5)
    custs = [(c, 200 + c, "Cust", str(c), "US") for c in range(1, 21)]
    wh.write_batch(
        spark.createDataFrame(
            custs,
            "customer_key int, customer_id int, customer_firstname string,"
            " customer_lastname string, country string",
        ),
        "gold",
        "dim_customers",
        B1,
    )
    wh.write_batch(
        spark.createDataFrame(
            [(1, "W", "R", "C", "S")],
            "product_key int, product_name string, product_line string,"
            " category string, sub_category string",
        ),
        "gold",
        "dim_products",
        B1,
    )
    # customer c carries c*10 distinct orders (10..200), one row each
    facts = [
        (f"SO{c}_{i}", c, 1, d, d, d, 10.0, 1, 10.0)
        for c in range(1, 21)
        for i in range(c * 10)
    ]
    wh.write_batch(
        spark.createDataFrame(
            facts,
            "order_number string, customer_key int, product_key int,"
            " order_date date, shipping_date date, due_date date,"
            " sales double, quantity int, price double",
        ),
        "gold",
        "fact_sales",
        B1,
    )
    mi.refresh_mv_incremental_approx(wh, "mv_customer_lifetime_value", B1)
    rows = wh.read_batch("mv", "mv_customer_lifetime_value", B1).collect()
    assert len(rows) == 20
    est_total, true_total = 0, 0
    for r in rows:
        true = (r["customer_id"] - 200) * 10
        rel = abs(r["order_count"] - true) / true
        assert rel <= 0.26, (r["customer_id"], r["order_count"], true)
        est_total += r["order_count"]
        true_total += true
    assert abs(est_total - true_total) / true_total <= 0.05
    # lifetime_value is exact regardless: 10.0 per order row
    assert all(
        r["lifetime_value"] == (r["customer_id"] - 200) * 100.0 for r in rows
    )


@pytest.mark.slow
def test_run_mvs_incremental_approx_wiring(spark, tmp_path):
    """mode="incremental_approx" refreshes all nine MVs SUCCESS, with
    only CLV routed through the approx path (its state table exists;
    the exact CLV state table does not)."""
    from python_sql_datawarehouse_project_spark.plans import mv
    from python_sql_datawarehouse_project_spark.plans.pipeline import run_mvs
    from python_sql_datawarehouse_project_spark.plans.runlog import RunLog

    wh = Warehouse(spark, str(tmp_path / "wh"))
    _seed_gold(spark, wh)
    log = RunLog(str(tmp_path / "log"))
    r1 = run_mvs(wh, log, B1, mode="incremental_approx")
    r2 = run_mvs(wh, log, B2, mode="incremental_approx")
    assert set(r1) == set(r2) == set(mv.MVS)
    bad = {n: e for n, (ok, e, _) in {**r1, **r2}.items() if not ok}
    assert not bad
    assert mi.state_batches(wh, mi._HLL_STATE) == [B1, B2]
    assert mi.state_batches(wh, "mv_customer_lifetime_value") == []
    # every OTHER incremental MV still matches the exact-mode outputs
    got = {
        (r["customer_id"], r["lifetime_value"], r["order_count"])
        for r in wh.read_batch(
            "mv", "mv_customer_lifetime_value", B2
        ).collect()
    }
    assert got == {(100, 180.0, 1), (101, 70.0, 1), (102, 80.0, 1)}
