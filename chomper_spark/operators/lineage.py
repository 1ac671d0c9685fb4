"""Per-batch, per-partition lineage & metrics.

The analogue of the reference's items_processed / items_dropped
counters (chomper/importers.py:44-45,81,102-105) and change listeners
(chomper/contrib/postgres.py:395-426), emitted set-oriented: one row
per (batch_id, key-partition) appended to a lineage table every
micro-batch.  Aggregation is map-side-combinable (groupBy on the
bucket id — same hash partitioning the MERGE already uses, so at
scale the metrics pass rides the existing shuffle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from chomper_spark import schema as S


def batch_lineage(
    batch: DataFrame,
    batch_id: int,
    n_buckets: int = 32,
    key_cols: list[str] | None = None,
    as_of_ts=None,
) -> DataFrame:
    """Per-key-partition metrics for one micro-batch.

    events_applied: events landing in the partition
    dedup_drops:    events superseded by a newer event for the same key
    merge_rows:     distinct keys (rows hitting the MERGE)
    watermark_lag_ms: processing-time lag vs the partition's newest
                      event (NULL in pure batch replays, where there is
                      no wall clock in the correctness path).
    """
    key_cols = key_cols or S.KEY_COLS
    # canonical string form — same widen-stable bucketing as the sink
    bucket = F.pmod(
        F.xxhash64(*[F.col(c).cast("string") for c in key_cols]), F.lit(n_buckets)
    ).cast("int")
    lag = (
        (F.unix_millis(F.lit(as_of_ts)) - F.unix_millis(F.max("op_ts"))).cast("long")
        if as_of_ts is not None
        else F.lit(None).cast("long")
    )
    return (
        batch.withColumn("_pid", bucket)
        .groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("events_applied"),
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in key_cols])).alias(
                "dedup_drops"
            ),
            F.count_distinct(*[F.col(c) for c in key_cols]).alias("merge_rows"),
            lag.alias("watermark_lag_ms"),
        )
        .select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            F.col("_pid").alias("partition_id"),
            "events_applied",
            "dedup_drops",
            "merge_rows",
            "watermark_lag_ms",
        )
    )


class LineageTable:
    """Append-only parquet lineage table, one directory per batch
    (append without rewriting history; idempotent per batch_id)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def append(self, lineage_df: DataFrame, batch_id: int) -> None:
        lineage_df.write.mode("overwrite").parquet(
            os.path.join(self.root, f"batch_id={batch_id}")
        )

    def read(self) -> DataFrame | None:
        """All appended batches as one frame; None when nothing has
        been appended yet (zero batch dirs — a glob read would raise
        PATH_NOT_FOUND on a healthy idle table)."""
        if not any(d.startswith("batch_id=") for d in os.listdir(self.root)):
            return None
        return self.spark.read.option("basePath", self.root).parquet(self.root + "/*")

    def expire(self, keep_batches: int) -> dict:
        """Retention for continuous streams: a lineage row set lands
        every micro-batch, so an unbounded run grows the table O(batches)
        — drop all but the newest ``keep_batches`` batch directories
        (ship older history to cold storage first if it must be kept).
        Returns {batches_removed, batches_kept}."""
        import shutil as _shutil

        if keep_batches < 1:
            raise ValueError("keep_batches must be >= 1")
        ids = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.root)
            if d.startswith("batch_id=") and d.split("=", 1)[1].lstrip("-").isdigit()
        )
        drop = ids[:-keep_batches] if len(ids) > keep_batches else []
        for b in drop:
            _shutil.rmtree(os.path.join(self.root, f"batch_id={b}"), ignore_errors=True)
        return {"batches_removed": len(drop), "batches_kept": min(len(ids), keep_batches)}


def dedup_drop_lineage(stats: DataFrame, batch_id: int, op: str) -> DataFrame:
    """Collapse a candidate-cap stats frame (``simhash_candidate_stats``
    / ``lsh_candidate_stats``: one row per bucket with ``members`` and
    ``members_dropped``) into ONE lineage row per dedup run.

    The dedup families bound their candidate self-joins with per-bucket
    caps; this is the "no silent caps" principle made OPERATIONAL: when
    a dedup op runs under the engine, append this row to a
    ``LineageTable`` so recall loss from cap saturation is a queryable
    production signal (alert on members_dropped > 0), not something
    only the test suite ever sees.  One map-side-combinable aggregate
    over the same melt the candidate generation uses — no extra scan
    of the corpus."""
    agg = stats.agg(
        F.count(F.lit(1)).alias("_buckets"),
        F.coalesce(
            F.sum((F.col("members_dropped") > 0).cast("long")), F.lit(0)
        ).alias("_over"),
        F.coalesce(F.sum("members_dropped"), F.lit(0)).alias("_dropped"),
        F.coalesce(F.max("members"), F.lit(0)).alias("_max"),
    )
    return agg.select(
        F.lit(batch_id).cast("long").alias("batch_id"),
        F.lit(op).alias("op"),
        F.col("_buckets").cast("long").alias("buckets_total"),
        F.col("_over").cast("long").alias("buckets_over_cap"),
        F.col("_dropped").cast("long").alias("members_dropped"),
        F.col("_max").cast("long").alias("max_bucket_members"),
    )


def record_dedup_run(
    table: "LineageTable", stats: DataFrame, batch_id: int, op: str
) -> None:
    """Append one dedup-run drop-stats row to a lineage table
    (idempotent per batch_id like all lineage appends)."""
    table.append(dedup_drop_lineage(stats, batch_id, op), batch_id)
