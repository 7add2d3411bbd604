"""Token-budget shard packing: assign documents to training shards of
~``budget`` tokens each.

Training dataloaders want shards (webdataset tars, TFRecord files,
Megatron bins) of roughly equal token counts. Greedy sequential
packing is a running sum — inherently ordered, so a naive global
window (``Window.orderBy`` with no partition key) collapses to ONE
task and is the textbook scale-killer. Instead we pack per bucket:

- bucket = doc_id % n_buckets — deterministic, layout-independent,
  and engine-portable (plain modulo, no hash seeds);
- within a bucket, docs are ordered by id and the running token sum
  assigns shard = floor((running - n_tok) / budget): a doc joins the
  shard its first token falls in. Docs are never split, so a shard
  that starts (or ends) with a boundary-straddling doc deviates from
  the budget by at most that doc's length: every shard except a
  bucket's last holds budget +/- max_doc_tokens.

Each bucket's window is one independent task; size ``n_buckets`` to
the cluster (executors x cores) and the pack is embarrassingly
parallel while staying deterministic. Shard ids are (bucket, seq) so
concurrent writers never contend on a shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_token_shards(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 4096,
    n_buckets: int = 16,
) -> DataFrame:
    """(doc_id, bucket, shard) shard assignment per document.

    ``id_col`` must be a non-negative integral column (use
    ``xxhash64`` upstream for string ids). Deterministic across runs,
    partitionings, and engines.
    """
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = df.select(
        F.col(id_col),
        (F.col(id_col) % n_buckets).alias("bucket"),
        token_count(F.col(text_col)).alias("n_tok"),
    )
    return toks.select(
        id_col,
        "bucket",
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / budget)
        .cast("bigint")
        .alias("shard"),
    )


def shard_manifest(packed: DataFrame) -> DataFrame:
    """Roll a :func:`pack_token_shards` assignment up to one row per
    shard — the manifest a writer job consumes. Single grouped agg on
    the (bucket, shard) key the pack already clusters by."""
    return packed.groupBy("bucket", "shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.min(packed.columns[0]).alias("first_doc"),
        F.max(packed.columns[0]).alias("last_doc"),
    )
