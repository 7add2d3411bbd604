"""Multimodal column plumbing (SURVEY.md §2.11).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators over ``mapInPandas`` — the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested, while
the actual media decoding is STUBBED: the media libraries (PIL,
torchaudio, av, ...) are not available in this environment, so the
decode step either uses an installed decoder (import-gated) or a
clearly-marked deterministic fake.

At scale: binary payloads ride the same parquet row groups as the
metadata; `spark.sql.files.maxPartitionBytes` keeps batches bounded;
nothing here ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("source_uri", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_MEDIA_TYPES = ["image/png", "audio/wav", "video/mp4"]


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic opaque binary column + metadata struct
    keyed by ``id_col`` — stands in for real media bytes so the
    pipeline plumbing can be exercised without media files."""
    payload_hex = F.md5(F.col(id_col).cast("string"))
    content = F.to_binary(F.concat(*([payload_hex] * 4)), F.lit("hex"))
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.withColumn("content", content).withColumn(
        "media_meta",
        F.struct(
            media_type.alias("media_type"),
            F.concat(F.lit("synthetic://"), F.col(id_col).cast("string")).alias("source_uri"),
            F.length(content).cast("long").alias("n_bytes"),
        ),
    )


def _try_real_decoder():
    """Import-gated real decoder; None in this environment."""
    try:  # pragma: no cover - decoder libs absent by design
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:
        return None


def extract_media_features(
    df: DataFrame, id_col: str = "doc_id", feature_dim: int = 8, allow_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract media via Arrow-batched mapInPandas.

    With no media decoder installed the decode is a deterministic fake
    (first ``feature_dim`` payload bytes scaled to [0,1]) — the
    distributed execution path (per-partition pandas batches, schema
    enforcement, no driver collect) is the real deliverable here.
    Set ``allow_stub=False`` to require a real decoder.
    """
    decoder = _try_real_decoder()
    if decoder is None and not allow_stub:
        raise NotImplementedError(
            "no media decoder available in this environment; "
            "install PIL/torchaudio/av or run with allow_stub=True"
        )

    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.col("content"),
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                [b / 255.0 for b in bytes(content[:feature_dim])]
                for content in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return src.mapInPandas(batches, schema=MEDIA_FEATURE_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_sec", T.DoubleType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, allow_stub: bool = True
) -> DataFrame:
    """Resize image rows (media_type image/*) via Arrow-batched
    mapInPandas: 1 row in -> 1 row out with a new binary payload.

    The Spark-side plumbing is real — image filter pushed before the
    Python stage, Arrow batch transfer, schema-enforced binary output,
    no driver collect. The pixel work is STUBBED (no PIL in this
    environment): the fake 'resized' payload is the input bytes
    tiled/truncated to ``width*height`` bytes, deterministic so tests
    can pin it. ``allow_stub=False`` requires a real decoder.
    """
    if _try_real_decoder() is None and not allow_stub:
        raise NotImplementedError("image resize requires PIL; not available here")
    n_out = width * height
    src = df.filter(F.col("media_meta.media_type").startswith("image/")).select(
        F.col("doc_id"), F.col("content")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = []
            for content in pdf["content"]:
                raw = bytes(content)
                reps = -(-n_out // max(1, len(raw)))  # ceil-div tile
                resized.append((raw * reps)[:n_out])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "content": resized,
                    "n_bytes": [len(r) for r in resized],
                }
            )

    return src.mapInPandas(batches, schema=RESIZED_IMAGE_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_n_seconds: float = 1.0, allow_stub: bool = True
) -> DataFrame:
    """Sample frames from video rows (media_type video/*) via
    Arrow-batched mapInPandas: 1 row in -> N frame rows out (the
    flatMap batch shape real frame extraction needs).

    Plumbing is real (video filter before the Python stage, per-frame
    fan-out inside the batch, schema-enforced binary frames); the
    decode is STUBBED: fake duration = ``n_bytes % 30 + 1`` seconds
    and each 'frame' is the payload rotated by the frame index —
    deterministic, so row counts and content are test-pinnable.
    """
    if _try_real_decoder() is None and not allow_stub:
        raise NotImplementedError("frame sampling requires av/ffmpeg; not available here")
    src = df.filter(F.col("media_meta.media_type").startswith("video/")).select(
        F.col("doc_id"), F.col("content"), F.col("media_meta.n_bytes").alias("n_bytes")
    )
    step = float(every_n_seconds)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, content, n_bytes in zip(
                pdf["doc_id"], pdf["content"], pdf["n_bytes"]
            ):
                raw = bytes(content)
                duration = int(n_bytes) % 30 + 1
                n_frames = int(duration / step) + 1
                for i in range(n_frames):
                    rot = (i * 7) % max(1, len(raw))
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * step)
                    frames.append(raw[rot:] + raw[:rot])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "ts_sec": tss, "frame": frames}
            )

    return src.mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)
