"""Streaming upsert sink via foreachBatch (SURVEY.md §2.10 stretch).

The production shape for "maintain a rollup table from a stream"
without a transactional table format: each micro-batch's aggregated
delta is MERGED into a keyed parquet table by overwriting only the key
partitions the batch touched (dynamic partition overwrite). Properties
that matter at scale:

- **Idempotent re-delivery**: a replayed micro-batch recomputes the
  same per-key totals from state and overwrites the same partitions —
  the sink converges instead of double-counting. That is what makes
  foreachBatch + overwrite safe under Structured Streaming's
  at-least-once batch re-execution contract.
- **Bounded writes**: only partitions present in the batch rewrite;
  an idle key's files are never touched (dynamic, not static,
  overwrite mode).
- **No driver collect**: the merge is executor-side parquet IO; the
  driver only coordinates the micro-batch.

A real deployment would point this at Delta/Iceberg `MERGE INTO`; the
parquet form keeps the repo dependency-free while exercising the same
plan shape (keyed agg -> partitioned overwrite per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_rollup_sink(
    stream: DataFrame,
    path: str,
    key_col: str = "event_type",
    watermark: str = "2 hours",
    query_name: str = "bdt_upsert_rollup",
):
    """Start an availableNow foreachBatch query maintaining a per-key
    rollup table at ``path``, partitioned by ``key_col``. Returns the
    StreamingQuery; callers await termination then read the table."""
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("value_dec"),
        )
        .select(
            key_col,
            "n",
            F.round(F.col("value_dec").cast("double"), 2).alias("value_sum"),
        )
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # update-mode batches carry the new FULL totals of only the
        # keys this batch changed: overwrite exactly those key
        # partitions (idempotent on batch replay — same state, same
        # partitions, same bytes). Dynamic overwrite is requested on
        # the WRITER, not the session conf — the caller's session-wide
        # overwrite semantics stay untouched.
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(key_col)
            .parquet(path)
        )

    return (
        agg.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def stateless_rollup_sink(
    stream: DataFrame,
    path: str,
    keys: list[str] | None = None,
    value_col: str = "value",
    query_name: str = "bdt_stateless_rollup",
):
    """Maintain a rollup from a stream with NO streaming state: each
    micro-batch aggregates only its own rows to a mergeable STATE
    frame (operators/incremental.py: count + exact-decimal sum +
    min/max) and merges it into the parquet state table.

    This is the complement of :func:`upsert_rollup_sink`: that one
    lets the engine hold running totals in its state store (right when
    the key set is bounded); this one offloads state to the TABLE, so
    executor memory is O(batch) regardless of how many distinct keys
    accumulate over the stream's lifetime — the shape you want when
    keys are unbounded (user ids, doc fingerprints) and 100 TB of
    history cannot live in a state store. Merge math is the state
    monoid, so batch boundaries never change the result.

    Unlike overwriting full per-key totals, MERGING a delta is not
    naturally idempotent — a replayed batch would double-count. The
    sink therefore stamps every state row with the highest applied
    batch id and SKIPS any batch already reflected in the table,
    restoring exactly-once table contents under the engine's
    at-least-once foreachBatch contract (the same ledger trick
    transactional sinks use internally). Plain-parquet caveat (same
    as upsert_rollup_sink): the read-merge-overwrite is not atomic;
    the merged frame is eagerly localCheckpoint'ed before the
    overwrite because the lazy plan reads the same files the write
    replaces, and a real deployment points this at a transactional
    format's MERGE INTO.
    """
    from pyspark.sql import functions as F  # noqa: F811 (executor closure)

    from ..operators.incremental import aggregate_state, merge_states

    keys = keys or ["event_type"]
    spark = stream.sparkSession

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = aggregate_state(batch_df, keys, value_col)
        try:
            old = spark.read.parquet(path)
        except Exception:  # first batch: no state table yet
            old = None
        if old is not None:
            applied = old.agg(F.max("applied_batch")).first()[0]
            if applied is not None and applied >= batch_id:
                return  # replayed batch: already reflected in the table
            merged = merge_states(keys, old.drop("applied_batch"), delta)
        else:
            merged = delta
        snap = merged.withColumn(
            "applied_batch", F.lit(batch_id).cast("long")
        ).localCheckpoint(eager=True)
        snap.write.mode("overwrite").parquet(path)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .outputMode("append")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def merge_upsert_sink(
    stream: DataFrame,
    table_root: str,
    key_col: str = "event_type",
    watermark: str = "2 hours",
    query_name: str = "bdt_merge_upsert",
    checkpoint_ns: str = "",
):
    """Transactional variant of :func:`upsert_rollup_sink` (r7): each
    micro-batch's new FULL per-key totals MERGE into an
    ``io.mergetable`` table — atomic versioned commit per batch,
    snapshot-isolated readers, and batch-id idempotence so Structured
    Streaming's at-least-once batch replay converges by the TABLE's
    ledger, not just by overwrite determinism.

    ``checkpoint_ns`` namespaces the recorded batch ids: replays
    within one checkpoint lineage deduplicate, while a fresh run
    (fresh checkpoint => batch ids restart at 0) against an existing
    table does not silently skip its first batches.
    """
    from ..io.mergetable import create_table, merge_upsert, read_manifest

    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("value_dec"),
        )
        .select(
            key_col,
            "n",
            F.round(F.col("value_dec").cast("double"), 2).alias("value_sum"),
        )
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            read_manifest(table_root)
        except FileNotFoundError:
            create_table(
                spark, table_root, batch_df, keys=[key_col], n_buckets=8
            )
            return
        merge_upsert(
            spark, table_root, batch_df, batch_id=f"{checkpoint_ns}-{batch_id}"
        )

    return (
        agg.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
