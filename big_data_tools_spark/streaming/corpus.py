"""Continuous corpus ingestion: curation + incremental dedup as a
Structured Streaming sink (§2.10 x the north-star dedup tier).

Each micro-batch of raw documents runs the SAME curation plan the
batch capstone pins (queries/corpus.py ``curate_frame``: PII scrub ->
quality -> language ID -> within-batch exact dedup), then drops
everything whose content fingerprint is already in the stored INDEX
of prior ingests, appends the survivors to the corpus table, and
merges their fingerprints into the index.

The 100 TB shape, same as the batch ``dedup_incremental_ingest``
query: history is touched only through its distinct-fingerprint index
(|distinct content| rows, never |docs|), so a day's crawl joins
against the index, not the corpus. Executor streaming state is ZERO —
dedup state lives in the index TABLE (the unbounded-key analogue of
``stateless_rollup_sink``), and an applied-batch ledger on the index
skips replayed batch ids, keeping corpus contents exactly-once under
foreachBatch's at-least-once contract.

Plain-parquet caveat (shared with the other foreachBatch sinks): the
docs-append + index-overwrite pair is not atomic — a crash BETWEEN
the two writes re-appends that batch on replay. A real deployment
points both at a transactional table format (then the append and the
index MERGE join the same commit); the ledger logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import fan_out
from ..queries.corpus import curate_frame


def read_corpus(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/docs")


def ingest_batch(batch_df: DataFrame, batch_id: int, out_dir: str) -> None:
    """The foreachBatch body (module-level so tests can drive replay
    and multi-batch scenarios deterministically)."""
    spark = batch_df.sparkSession
    index_path = f"{out_dir}/index"
    docs_path = f"{out_dir}/docs"
    try:
        index = spark.read.parquet(index_path)
    except Exception:  # first batch: no index yet
        index = None
    if index is not None:
        applied = index.agg(F.max("applied_batch")).first()[0]
        if applied is not None and applied >= batch_id:
            return  # replayed batch: already reflected
    kept = curate_frame(fan_out(batch_df, "doc_id"))
    if index is not None:
        kept = kept.join(index.select("fp"), "fp", "left_anti")
    # localCheckpoint before the writes: `kept` is consumed twice
    # (docs append + index merge) and the index merge reads the files
    # the overwrite replaces
    kept = kept.localCheckpoint(eager=True)
    kept.select(
        "doc_id", "source", "pred_lang", "quality", "n_tok", "text"
    ).write.mode("append").parquet(docs_path)
    new_fps = kept.select("fp").distinct()
    merged = (
        index.select("fp").unionByName(new_fps).distinct()
        if index is not None
        else new_fps
    )
    snap = merged.withColumn(
        "applied_batch", F.lit(batch_id).cast("long")
    ).localCheckpoint(eager=True)
    snap.write.mode("overwrite").parquet(index_path)


def corpus_ingest_sink(
    stream_docs: DataFrame,
    out_dir: str,
    query_name: str = "bdt_corpus_ingest",
):
    """availableNow drain of a raw-documents stream through
    :func:`ingest_batch` into ``out_dir/{docs,index}``."""
    return (
        stream_docs.writeStream.foreachBatch(
            lambda df, bid: ingest_batch(df, bid, out_dir)
        )
        .outputMode("append")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def read_documents_stream(
    spark,
    source_dir: str,
    path_glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over a directory of documents parquet files.
    Schema comes from a lazy batch probe of the same files (footer
    only — no data scan); documents carry no timestamp columns, so no
    variant normalization is needed (contrast events in
    streaming/events.py). ``max_files_per_trigger`` bounds each
    micro-batch (ingestion-rate control: one day's crawl drop = many
    files = many bounded batches, not one giant one)."""
    batch = spark.read
    if path_glob:
        batch = batch.option("pathGlobFilter", path_glob)
    schema = batch.parquet(source_dir).schema
    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)
