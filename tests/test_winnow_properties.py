"""Property pins for the winnowing fingerprint family (wn1/wn2) and
the temperature mixture allocator (ds12).

The oracle-parity suite proves cross-engine equality; these tests pin
the DESIGN guarantees that equality alone can't see:

  * the winnowing guarantee (SIGMOD'03): any shared token run of
    length >= K_GRAM + WINNOW_W - 1 yields at least one shared
    selected fingerprint — the property that makes wn1 a sound
    span-overlap LOWER bound;
  * the density bound: winnowing selects at most one fingerprint per
    gram window, so |fps| <= n_windows and in expectation ~2/(W+1)
    of gram positions — the reason fingerprint grain stays a
    fraction of token grain at 100 TB;
  * containment asymmetry: a short doc pasted into a long one scores
    ~1.0 containment (src=short) while the reverse direction is low
    — the case symmetric Jaccard dilutes;
  * ds12: the largest-remainder allocation sums EXACTLY to the
    budget, quotas follow sqrt-flattened (not raw) shares, and the
    selected sample per language is exactly the quota.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from python_sql_datawarehouse_project_spark.operators.winnow import (
    CONTAIN_MIN,
    K_GRAM,
    WINNOW_W,
    fingerprints_of,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(seed: str, n: int) -> str:
    return " ".join(f"{seed}{i}" for i in range(n))


def test_winnowing_guarantee_shared_run(spark):
    # Two docs sharing a verbatim run of exactly K + W - 1 tokens,
    # embedded in otherwise-disjoint text: the guarantee threshold.
    run = _words("shared", K_GRAM + WINNOW_W - 1)
    docs = _docs(
        spark,
        [
            (1, _words("alpha", 30) + " " + run + " " + _words("beta", 30)),
            (2, _words("gamma", 25) + " " + run + " " + _words("delta", 25)),
        ],
    )
    fps = fingerprints_of(docs)
    shared = (
        fps.groupBy("fp").agg(F.countDistinct("doc_id").alias("n"))
        .where(F.col("n") == 2)
        .count()
    )
    assert shared >= 1, "shared run >= K+W-1 tokens must share a fingerprint"


def test_winnowing_no_false_sharing_on_disjoint_docs(spark):
    docs = _docs(
        spark,
        [(1, _words("left", 60)), (2, _words("right", 60))],
    )
    fps = fingerprints_of(docs)
    shared = (
        fps.groupBy("fp").agg(F.countDistinct("doc_id").alias("n"))
        .where(F.col("n") == 2)
        .count()
    )
    assert shared == 0


def test_winnowing_density_bound(spark):
    n_tokens = 200
    docs = _docs(spark, [(1, _words("w", n_tokens))])
    n_fps = fingerprints_of(docs).count()
    n_windows = (n_tokens - K_GRAM + 1) - WINNOW_W + 1
    assert n_fps <= n_windows
    # Expectation is ~2/(W+1) of gram positions; allow generous slack
    # but catch a regression to "all grams selected".
    assert n_fps <= 0.75 * (n_tokens - K_GRAM + 1)


def test_containment_asymmetric_for_pasted_doc(spark):
    short = _words("core", 20)
    long_doc = _words("pre", 100) + " " + short + " " + _words("post", 100)
    docs = _docs(spark, [(1, short), (2, long_doc)])
    fps = fingerprints_of(docs)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    shared = (
        fps.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("n"))
        .where(F.col("n") == 2)
        .count()
    )
    c_short_in_long = shared / per_doc[1]
    c_long_in_short = shared / per_doc[2]
    assert c_short_in_long >= CONTAIN_MIN
    assert c_long_in_short < c_short_in_long


def test_ds12_budget_exact_and_flattened(spark, sf_dir):
    from python_sql_datawarehouse_project_spark.catalog import load_table
    from python_sql_datawarehouse_project_spark.operators.mix import (
        DS12_BUDGET,
        ds12_temperature_mix,
    )

    rows = {r["lang"]: r.asDict() for r in ds12_temperature_mix(spark, sf_dir).collect()}
    assert sum(r["alloc"] for r in rows.values()) == DS12_BUDGET
    for r in rows.values():
        assert r["n_sample"] == r["alloc"]
    n_total = sum(r["n_docs"] for r in rows.values())
    # sqrt-temperature flattening: the largest language's quota share
    # sits strictly between the uniform share and its raw share.
    biggest = max(rows.values(), key=lambda r: r["n_docs"])
    raw_share = biggest["n_docs"] / n_total
    quota_share = biggest["alloc"] / DS12_BUDGET
    uniform = 1.0 / len(rows)
    assert uniform < quota_share < raw_share
    # Selection is ds4's md5-rank order truncated at the quota: pin
    # membership for one language against a direct recomputation.
    from python_sql_datawarehouse_project_spark.functions import hashing as H

    lang = biggest["lang"]
    docs = load_table(spark, sf_dir, "documents").where(F.col("lang") == lang)
    expect = (
        docs.select(
            "doc_id",
            H.md5_long(F.col("doc_id").cast("string")).alias("h"),
        )
        .orderBy("h", "doc_id")
        .limit(biggest["alloc"])
        .agg(F.sum("doc_id"))
        .collect()[0][0]
    )
    assert biggest["sample_doc_id_sum"] == expect
