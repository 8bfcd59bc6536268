"""Warehouse storage: batch-partitioned parquet tables with the
reference's delete-then-insert idempotency, expressed as dynamic
partition overwrite (SURVEY.md §1.5).

Every bronze/silver/gold table is partitioned by dwh_batch_id; writing
a batch replaces exactly that partition ("DELETE WHERE dwh_batch_id =
X; INSERT", reference tools.load_crm_cust_info_v1.sql:58-62 and
scripts/load_to_bronze.py:590-604) and re-runs are exactly-once.  At
100 TB this is also the scan-pruning story: every proc-equivalent
reads one partition, never the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_COL = "dwh_batch_id"


class Warehouse:
    """A layered parquet warehouse rooted at a directory.

    Tables live at {root}/{layer}/{name}/ partitioned by dwh_batch_id.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, layer: str, name: str) -> str:
        return os.path.join(self.root, layer, name)

    def exists(self, layer: str, name: str) -> bool:
        return os.path.isdir(self.path(layer, name))

    def write_batch(self, df: DataFrame, layer: str, name: str, batch_id: str) -> int:
        """Idempotent overwrite of one batch partition; returns rowcount.

        The count is observed during the write job itself (F.observe:
        zero extra scans, exact number of rows that landed — the Spark
        analogue of GET DIAGNOSTICS ROW_COUNT in the procs).  An empty
        result writes no partition files under dynamic overwrite, so
        the count must NOT come from a read-back (the table dir may not
        even exist yet for a first empty batch).
        """
        from pyspark.sql import Observation

        obs = Observation()
        out = df.withColumn(BATCH_COL, F.lit(batch_id)).observe(
            obs, F.count(F.lit(1)).alias("rows")
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL)
            .parquet(self.path(layer, name))
        )
        return int(obs.get["rows"])

    def _drop_batch_partition(self, layer: str, name: str, batch_id: str) -> None:
        """Remove one batch partition directory.  Needed wherever a
        rewrite may legitimately produce ZERO rows: dynamic overwrite
        writes no files for an empty result, so the old partition
        would otherwise survive on disk (delete_keys, merge_upsert,
        write_batch_with_expectations all route through this)."""
        import shutil

        shutil.rmtree(
            os.path.join(self.path(layer, name), f"{BATCH_COL}={batch_id}"),
            ignore_errors=True,
        )

    def write_batch_with_expectations(
        self,
        df: DataFrame,
        layer: str,
        name: str,
        batch_id: str,
        expectations: dict[str, str],
        runlog=None,
    ) -> dict:
        """Expectation-gated idempotent write: rows satisfying EVERY
        predicate land in the table's batch partition; failing rows
        land in the same batch partition of ``<name>__quarantine``
        with a ``_failed_expectations`` array naming the violated
        rules.  Returns ``{"passed", "quarantined", "by_rule"}``
        (exact counts; by_rule counts rows per violated rule —
        a row can appear under several).

        Semantics: a predicate evaluating NULL counts as FAILED (the
        strict CHECK policy modern expectation frameworks apply —
        unlike SQL CHECK's null-passes rule — so a null in a guarded
        column cannot slip through as "unknown").  The reference's row
        validation (SURVEY.md §2.11 V3, validate_row.py:398-481)
        counts violations and loads everything anyway; this is the
        quarantine upgrade of that contract: the batch stays loadable
        AND auditable, and a re-run replaces both partitions
        (idempotency extends to the quarantine table).

        Scale: ONE pass computes the flag array (pure row
        expressions); the flagged frame is materialized once
        (localCheckpoint — the shared-subplan rule, it feeds the good
        write, the quarantine write and the stats aggregate), and both
        writes are partition-pruned dynamic overwrites.  If ``runlog``
        is given, a ``row_validation_log`` row records the counts."""
        flags = F.array(
            *[
                F.struct(
                    F.lit(rule).alias("r"),
                    F.coalesce(F.expr(pred), F.lit(False)).alias("ok"),
                )
                for rule, pred in expectations.items()
            ]
        )
        failed = F.transform(
            F.filter(flags, lambda s: ~s["ok"]), lambda s: s["r"]
        )
        flagged = df.withColumn(
            "_failed_expectations", failed
        ).localCheckpoint(eager=True)
        good = flagged.where(F.size("_failed_expectations") == 0).drop(
            "_failed_expectations"
        )
        bad = flagged.where(F.size("_failed_expectations") > 0)
        n_good = self.write_batch(good, layer, name, batch_id)
        n_bad = self.write_batch(bad, layer, f"{name}__quarantine", batch_id)
        # Dynamic overwrite writes NO files for an empty result, so a
        # re-run whose pass/fail split changed (all rows now pass where
        # some were quarantined before, or vice versa) would leave the
        # STALE partition on disk while the runlog reports the new
        # counts.  Mirror delete_keys: an empty side explicitly drops
        # its batch partition (round-6 ADVICE fix).
        if n_good == 0:
            self._drop_batch_partition(layer, name, batch_id)
        if n_bad == 0:
            self._drop_batch_partition(layer, f"{name}__quarantine", batch_id)
        per_rule = (
            flagged.select(
                F.explode("_failed_expectations").alias("rule")
            )
            .groupBy("rule")
            .count()
            .collect()
        )
        by_rule = {r["rule"]: r["count"] for r in per_rule}
        if runlog is not None:
            runlog.append(
                "row_validation_log",
                batch_id=batch_id,
                table=f"{layer}.{name}",
                status="SUCCESS" if n_bad == 0 else "QUARANTINED",
                passed=n_good,
                quarantined=n_bad,
                by_rule=by_rule,
            )
        return {"passed": n_good, "quarantined": n_bad, "by_rule": by_rule}

    def read_table(self, layer: str, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(layer, name))

    def read_batch(self, layer: str, name: str, batch_id: str) -> DataFrame:
        """Partition-pruned single-batch scan (P4, SURVEY.md §2.2)."""
        return self.read_table(layer, name).filter(F.col(BATCH_COL) == batch_id)

    def batch_is_empty(self, layer: str, name: str, batch_id: str) -> bool:
        """Empty-batch short-circuit (reference procs' COUNT(*)=0 guard,
        tools.load_crm_cust_info_v1.sql:29-40) — limit-1 scan, not a
        full count."""
        if not self.exists(layer, name):
            return True
        return self.read_batch(layer, name, batch_id).isEmpty()

    def fingerprint_batches(self, layer: str, name: str) -> DataFrame:
        """Per-batch content fingerprint (row count, BIT_XOR and
        mod-2^32 SUM of a canonical row hash) — the warehouse-API
        generalization of the q42 gate: two warehouses (a replica, a
        migrated copy, a rebuilt pipeline) compare per-batch rows
        instead of data, and only disagreeing batches need a q40-style
        full diff.

        All accumulators are commutative and map-side combinable, so
        the fingerprint is independent of file layout, partitioning
        and row order — compaction and repartitioning do not change
        it (pytest-pinned); any single-row change does.  Columns hash
        in sorted-name order with a NUL sentinel for NULLs (concat_ws
        would otherwise collide NULL column positions).  Same-engine
        comparisons only: the string rendering of doubles is
        Spark-internal, which is exactly the replica-vs-replica use
        case (the cross-ENGINE variant is the oracled q42 gate)."""
        df = self.read_table(layer, name)
        cols = sorted(c for c in df.columns if c != BATCH_COL)
        rendered = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in cols
        ]
        h = F.conv(
            F.substring(F.md5(F.concat_ws("\x1f", *rendered)), 1, 15), 16, 10
        ).cast("long")
        h32 = F.pmod(h, F.lit(1 << 32))
        return df.groupBy(BATCH_COL).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(h32).alias("xor_fp"),
            F.pmod(F.sum(h32), F.lit(1 << 32)).alias("sum_fp"),
        )

    # -- multi-table atomic publish -----------------------------------

    def _commits_dir(self) -> str:
        return os.path.join(self.root, "_commits")

    def commit_batch(self, batch_id: str, tables: list) -> None:
        """Publish a batch across MANY tables atomically: after every
        per-table write_batch succeeded, record one manifest file via
        write-to-temp + os.replace (an atomic rename on POSIX).
        Readers going through read_committed() see the batch in ALL
        its tables or in NONE — the cross-table consistency the
        medallion pipeline needs so a crash between the silver and
        gold writes cannot expose a half-published load.

        The manifest holds the (layer, name) list for auditability;
        re-committing the same batch (a pipeline replay) just
        replaces the manifest — idempotent like the writes."""
        import json
        import tempfile

        os.makedirs(self._commits_dir(), exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            prefix=f".{batch_id}.", dir=self._commits_dir()
        )
        with os.fdopen(fd, "w") as f:
            json.dump(
                {"batch_id": batch_id, "tables": [list(t) for t in tables]},
                f,
            )
        os.replace(tmp, os.path.join(self._commits_dir(), f"{batch_id}.json"))

    def committed_batches(self) -> list[str]:
        d = self._commits_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            f[: -len(".json")]
            for f in os.listdir(d)
            if f.endswith(".json") and not f.startswith(".")
        )

    def read_committed(self, layer: str, name: str) -> DataFrame:
        """The table restricted to published batches.  The filter is
        an IN on the PARTITION column, so unpublished batches prune at
        plan time — their half-written files are never even listed
        into the scan.  Commit manifests are per-warehouse (thousands
        of ids, driver-side), not per-row state."""
        committed = self.committed_batches()
        return self.read_table(layer, name).filter(
            F.col(BATCH_COL).isin(committed)
        )

    def list_batches(self, layer: str, name: str) -> list[str]:
        """Batch ids present on disk, sorted — the table's load
        history, read from the partition directory names (no file
        footers touched)."""
        base = self.path(layer, name)
        if not os.path.isdir(base):
            return []
        prefix = f"{BATCH_COL}="
        return sorted(
            d[len(prefix):]
            for d in os.listdir(base)
            if d.startswith(prefix)
        )

    def read_as_of(self, layer: str, name: str, batch_id: str) -> DataFrame:
        """Time travel: the table as of load `batch_id` — every batch
        partition with id <= batch_id (lexical order; the pipeline's
        batch ids are zero-padded/date-stamped so lexical = load
        order).  The filter is on the PARTITION column, so Spark
        prunes the newer partitions at planning time and never lists
        their files into the scan (pinned in test_storage_maintenance)
        — as-of reads cost what they scan, not what the table holds.

        Semantics note: write_batch's dynamic overwrite REPLACES a
        re-run batch in place, so as-of sees each batch's latest
        content — this is "state after loads <= B", the idempotent-
        pipeline notion of time travel, not an MVCC snapshot log."""
        return self.read_table(layer, name).filter(
            F.col(BATCH_COL) <= batch_id
        )

    # -- storage maintenance (beyond-reference warehouse operations) --

    def read_table_evolved(self, layer: str, name: str) -> DataFrame:
        """Schema-evolution read: batches written before a column was
        added still scan cleanly, with NULLs where the column did not
        exist (parquet mergeSchema — the footer union, computed once
        at planning time).  The per-batch write path needs no change:
        schema evolution in a batch-partitioned layout is purely a
        read-side union of footers, which is why the warehouse can add
        columns without rewriting history."""
        return (
            self.spark.read.option("mergeSchema", "true")
            .parquet(self.path(layer, name))
        )

    def compact_batch(
        self, layer: str, name: str, batch_id: str, target_files: int
    ) -> int:
        """Small-files compaction for one batch partition: rewrite it
        at a bounded file count and return the new count.

        Streaming/micro-batch ingestion leaves many tiny files per
        partition; at 100 TB the scan-planning and footer costs of
        millions of small files dominate before a byte is read.
        Compaction is the same idempotent dynamic-overwrite as
        write_batch (a replay rewrites the same partition), restricted
        to one partition so running it online races nothing outside
        that batch.  The rewrite preserves rows exactly — asserted in
        tests — because it is a coalesce of the pruned scan, not a
        recompute."""
        part = self.read_batch(layer, name, batch_id).drop(BATCH_COL)
        self.write_batch(
            part.coalesce(target_files), layer, name, batch_id
        )
        part_dir = os.path.join(
            self.path(layer, name), f"{BATCH_COL}={batch_id}"
        )
        return len(
            [f for f in os.listdir(part_dir) if f.endswith(".parquet")]
        )

    def merge_upsert(
        self,
        layer: str,
        name: str,
        source: DataFrame,
        key_col: str,
        batch_id: str,
        delete_col: str | None = None,
    ) -> dict:
        """MERGE INTO semantics over the batch-partitioned layout:
        matched keys are UPDATED in place (their original batch
        partition is rewritten with the source row), unmatched source
        rows are INSERTED into `batch_id`, and source rows flagged
        true in `delete_col` DELETE their matched target rows.
        Returns {"updated": n, "inserted": n, "deleted": n}.

        Partition-pruned like delete_keys: only batches that contain
        a source key are rewritten; untouched partitions keep their
        files.  The source broadcasts (the CDC-delta / correction-feed
        case MERGE exists for is small relative to the table); a
        big-big merge should instead land the delta as its own batch
        and reconcile through the silver dedup (w1 keep-latest).

        Re-running the same merge converges: the second pass finds
        every insert already present (they become no-op updates) and
        every delete already gone.  Duplicate target rows under one
        key are ALL replaced by the source row — MERGE's
        one-row-per-key contract is the caller's to uphold, as in
        SQL engines that raise on multi-match.

        Ordering matters for correctness: the insert set is
        materialized (localCheckpoint) BEFORE any partition rewrite,
        because a DataFrame's file listing is pinned at read time and
        rewritten partitions would otherwise feed the anti-join
        deleted files."""
        table = self.read_table(layer, name)
        cols = [c for c in table.columns if c != BATCH_COL]
        # Delete-flagged rows stay in src_keys (so their target rows
        # are dropped from rewritten partitions) but leave `ups` (so
        # nothing re-adds or inserts them).
        if delete_col is not None:
            ups = source.where(~F.col(delete_col)).select(*cols)
        else:
            ups = source.select(*cols)

        # 1. Pin the insert set and affected partitions against the
        #    PRE-merge table state.
        inserts = ups.join(
            table.select(key_col), key_col, "left_anti"
        ).localCheckpoint(eager=True)
        src_keys = source.select(key_col)
        affected = [
            r[0]
            for r in table.join(F.broadcast(src_keys), key_col, "left_semi")
            .select(BATCH_COL)
            .distinct()
            .collect()
        ]

        # 2. Rewrite each affected partition: drop every matched row,
        #    re-add the source version for non-delete matches.  A
        #    matched row that is NOT re-added was delete-flagged:
        #    deleted = (rows removed) - (rows replaced).
        updated = deleted = 0
        for b in affected:
            part = self.read_batch(layer, name, b).drop(BATCH_COL)
            matched_ups = ups.join(
                F.broadcast(part.select(key_col)), key_col, "left_semi"
            )
            kept = part.join(F.broadcast(src_keys), key_col, "left_anti")
            n_before = part.count()
            n_matched = matched_ups.count()
            out = kept.select(*cols).unionByName(matched_ups)
            n_after = self.write_batch(out, layer, name, b)
            if n_after == 0:
                self._drop_batch_partition(layer, name, b)
            updated += n_matched
            # n_after = kept + n_matched, so the matched rows that
            # vanished (delete-flagged) are exactly n_before - n_after.
            deleted += n_before - n_after

        # 3. Land the inserts in their own batch (idempotent: a replay
        #    finds an empty insert set and leaves the partition alone).
        n_inserted = 0
        if not inserts.isEmpty():
            existing = (
                self.read_batch(layer, name, batch_id).drop(BATCH_COL)
                if self.exists(layer, name)
                and os.path.isdir(
                    os.path.join(
                        self.path(layer, name), f"{BATCH_COL}={batch_id}"
                    )
                )
                else None
            )
            landing = (
                inserts
                if existing is None
                else existing.select(*cols).unionByName(inserts)
            )
            before = 0 if existing is None else existing.count()
            n_inserted = (
                self.write_batch(landing, layer, name, batch_id) - before
            )
        return {"updated": updated, "inserted": n_inserted, "deleted": deleted}

    def delete_keys(
        self, layer: str, name: str, key_col: str, keys: DataFrame
    ) -> int:
        """Hard-delete rows by key (right-to-be-forgotten): rewrite
        ONLY the batch partitions that contain the keys, anti-joining
        the keys out; untouched partitions keep their files byte-
        identical.  Returns the number of rows deleted.

        The affected-partition discovery is a pruned aggregate over
        the key semi-join (at scale: a broadcast of the deletion list,
        which GDPR-class requests keep tiny), so a 100 TB table
        rewrites only the partitions a deleted key ever landed in —
        with dd7-style id lists this is the deletion path a training
        corpus needs when a takedown arrives."""
        table = self.read_table(layer, name)
        affected = [
            r[0]
            for r in table.join(F.broadcast(keys), key_col, "left_semi")
            .select(BATCH_COL)
            .distinct()
            .collect()
        ]
        deleted = 0
        for b in affected:
            part = self.read_batch(layer, name, b).drop(BATCH_COL)
            kept = part.join(F.broadcast(keys), key_col, "left_anti")
            n_before = part.count()
            n_after = self.write_batch(kept, layer, name, b)
            if n_after == 0:
                # dynamic overwrite writes NO files for an empty
                # result, which would leave the old partition (and the
                # supposedly-deleted rows) on disk — drop it explicitly
                self._drop_batch_partition(layer, name, b)
            deleted += n_before - n_after
        return deleted
