"""Design pins for dd19_semdedup (the SemDeDup cluster-then-prune
verdict) — properties oracle equality can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_sql_datawarehouse_project_spark.functions import hashing as H
from python_sql_datawarehouse_project_spark.operators.kmeans import (
    _best_centroid,
    train_centroids,
)
from python_sql_datawarehouse_project_spark.operators.semdedup import (
    SEM_TAU,
    dd19_semdedup,
)
from python_sql_datawarehouse_project_spark.operators.similarity import (
    _emb_normalized,
)


def _verdict_and_pairs(spark, sf_dir):
    verdict = dd19_semdedup(spark, sf_dir)
    n = _emb_normalized(spark, sf_dir)
    cents = train_centroids(n)
    scored = n.select(
        "vec_id", "vn", _best_centroid(F.col("vn"), cents).alias("cid")
    )
    a, b = scored.alias("a"), scored.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(H.dot_fold(F.col("a.vn"), F.col("b.vn")) >= SEM_TAU)
        .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
    )
    return verdict, pairs


def test_every_neardup_pair_loses_exactly_one_side_or_both(spark, sf_dir):
    verdict, pairs = _verdict_and_pairs(spark, sf_dir)
    keep = {r["vec_id"]: r["keep"] for r in verdict.collect()}
    pair_rows = pairs.collect()
    assert pair_rows, "test corpus must contain intra-cluster near-dups"
    for r in pair_rows:
        # soundness: no near-dup pair survives with both members kept
        assert keep[r["va"]] == 0 or keep[r["vb"]] == 0


def test_drops_only_pair_participants(spark, sf_dir):
    verdict, pairs = _verdict_and_pairs(spark, sf_dir)
    participants = {r["va"] for r in pairs.collect()} | {
        r["vb"] for r in pairs.collect()
    }
    dropped = {
        r["vec_id"] for r in verdict.where(F.col("keep") == 0).collect()
    }
    assert dropped, "verdict must drop at least one vector on the test corpus"
    assert dropped <= participants


def test_capped_verdict_is_conservative_and_recalls(spark, sf_dir):
    """dd20 can only MISS near-dup pairs (its pair set is a subset of
    dd19's), so its drop set must be a subset of dd19's drops — and
    on the seeded test corpus the csim-sorted window must recover a
    meaningful fraction of them (the sorted-neighborhood premise:
    true near-dups have near-identical centroid similarity)."""
    from python_sql_datawarehouse_project_spark.operators.semdedup import (
        dd20_semdedup_capped,
    )

    full = {
        r["vec_id"]
        for r in dd19_semdedup(spark, sf_dir).where("keep = 0").collect()
    }
    capped = {
        r["vec_id"]
        for r in dd20_semdedup_capped(spark, sf_dir)
        .where("keep = 0")
        .collect()
    }
    assert full, "test corpus must produce dd19 drops"
    assert capped <= full
    assert len(capped) / len(full) >= 0.6


def test_paper_rule_drops_the_centroid_nearest_member(spark, sf_dir):
    verdict, pairs = _verdict_and_pairs(spark, sf_dir)
    rows = {r["vec_id"]: r for r in verdict.collect()}
    for r in pairs.collect():
        a, b = rows[r["va"]], rows[r["vb"]]
        loser = a if a["csim"] > b["csim"] else b if b["csim"] > a["csim"] else max(a, b, key=lambda x: x["vec_id"])
        assert loser["keep"] == 0
