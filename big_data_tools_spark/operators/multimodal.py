"""Multimodal column operators (SURVEY.md §2.11) — REAL decode path.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators over ``mapInPandas``. As of round 3 the
decode step is REAL, not stubbed: `operators/imagecodec.py` implements
pure-stdlib PNG (full inflate + unfilter), WAV (PCM16), and MP4
container-metadata codecs, so synthetic fixtures are *valid media
bytes* and the extractors return actual decoded dimensions, durations,
and pixel/sample statistics. When PIL is installed it is preferred for
images (more formats); the pure codec is the always-available
fallback. As of round 5 video FRAME PAYLOADS are real too: containers
carry PNG samples behind genuine ``stts``/``stsz``/``mdat`` boxes (the
motion-JPEG layout with a pure-stdlib intra codec), so frame sampling
and video features decode actual pixels. The remaining honest
limitation is codec COVERAGE — H.264/H.265 bitstreams would need an
external decoder (av/ffmpeg), and metadata-only containers raise
unless ``allow_stub=True``.

At scale: binary payloads ride the same parquet row groups as the
metadata; ``spark.sql.files.maxPartitionBytes`` keeps Arrow batches
bounded; decode cost is per-byte Python work, so the media filter
(``media_type`` predicate) is applied BEFORE the Python stage and
nothing ever collects to the driver.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .imagecodec import (
    decode_mp4_duration,
    decode_png,
    decode_video_samples,
    decode_wav,
    encode_mp4_video,
    encode_png,
    encode_wav,
    image_dimensions,
    resize_nearest,
)

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
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_MEDIA_TYPES = ["image/png", "audio/wav", "video/mp4"]


def synth_media_bytes(doc_id: int) -> tuple[str, bytes]:
    """Deterministic VALID media bytes for ``doc_id`` (fixture
    generator): a decodable PNG gradient, a PCM16 WAV triangle wave, or
    an MP4 container with a real mvhd duration — so the decode path is
    exercised for real, not against random bytes."""
    kind = doc_id % 3
    if kind == 0:
        w, h = 8 + doc_id % 9, 6 + doc_id % 7
        px = bytes(
            (x * 37 + y * 11 + c * 71 + doc_id) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        return "image/png", encode_png(w, h, px, channels=3)
    if kind == 1:
        n = 400 + (doc_id % 10) * 200  # 0.05-0.275 s at 8 kHz
        step = doc_id % 17 + 1
        samples = [((i * step) % 200 - 100) * 300 for i in range(n)]
        return "audio/wav", encode_wav(samples, sample_rate=8000)
    # video: REAL frame payloads — one 4x3 PNG sample per second in an
    # ISO-BMFF container with genuine stts/stsz/mdat boxes (duration
    # stays doc_id % 30 + 1, now as n_frames at 1 fps)
    return "video/mp4", encode_mp4_video(
        [_synth_frame_png(doc_id, i) for i in range(doc_id % 30 + 1)], fps=1.0
    )


_FRAME_W, _FRAME_H = 4, 3


def _synth_frame_png(doc_id: int, frame_idx: int) -> bytes:
    """Deterministic per-frame pixels (the fixture formula the tests
    pin decoded values against)."""
    px = bytes(
        (x * 37 + y * 11 + c * 71 + doc_id + 13 * frame_idx) % 256
        for y in range(_FRAME_H)
        for x in range(_FRAME_W)
        for c in range(3)
    )
    return encode_png(_FRAME_W, _FRAME_H, px, channels=3)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic media binary column + metadata struct
    keyed by ``id_col``. "Fake" means synthetic CONTENT, not invalid
    bytes: every payload is a well-formed PNG/WAV/MP4 that the real
    decoders in imagecodec.py round-trip (generation happens
    executor-side in an Arrow batch, one pass, no shuffle)."""

    @F.pandas_udf(T.BinaryType())
    def media_bytes(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: synth_media_bytes(int(i))[1])

    media_type = F.element_at(
        F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    content = media_bytes(F.col(id_col))
    return df.withColumn("content", content).withColumn(
        "media_meta",
        F.struct(
            media_type.alias("media_type"),
            F.concat(F.lit("synthetic://"), F.col(id_col).cast("string")).alias(
                "source_uri"
            ),
            F.length(F.col("content")).cast("long").alias("n_bytes"),
        ),
    )


def _try_real_decoder():
    """Import-gated PIL; the pure-stdlib codec is used when absent."""
    try:  # pragma: no cover - PIL absent in this environment
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:
        return None


def _decode_image(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — PIL when installed, else
    the pure-Python PNG decoder."""
    if _try_real_decoder() == "pil":  # pragma: no cover
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(data)).convert("RGB")
        return img.width, img.height, 3, img.tobytes()
    return decode_png(data)


def _image_feature(data: bytes, dim: int) -> tuple[int, int, list[float]]:
    """Real pixel statistics: per-channel means, then overall
    mean/min/max, scaled to [0,1] and padded to ``dim``."""
    w, h, ch, px = _decode_image(data)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch).astype(np.float64)
    feat = [float(arr[:, :, c].mean()) / 255.0 for c in range(ch)]
    feat += [float(arr.mean()) / 255.0, float(arr.min()) / 255.0, float(arr.max()) / 255.0]
    return w, h, (feat + [0.0] * dim)[:dim]


def _audio_feature(data: bytes, dim: int) -> tuple[float, list[float]]:
    """Real signal statistics from the decoded PCM samples."""
    rate, n, samples = decode_wav(data)
    duration = n / rate
    arr = np.asarray(samples, dtype=np.float64) / 32768.0
    feat = [
        duration,
        rate / 48000.0,
        float(np.sqrt((arr**2).mean())) if n else 0.0,  # RMS
        float(np.abs(arr).max()) if n else 0.0,  # peak
        float(arr.mean()) if n else 0.0,  # DC offset
    ]
    return duration, (feat + [0.0] * dim)[:dim]


def _video_feature(data: bytes, n_bytes: int, dim: int) -> tuple[float, list[float]]:
    """Real frame-content statistics: duration from the mvhd box (or
    the decoded sample timestamps for non-BMFF containers), plus
    first/middle/last decoded-frame pixel means and the across-frame
    mean/std of per-frame means (temporal variation)."""
    # ADVICE r6: decode FIRST — with PyAV installed a webm/mkv the av
    # backend can decode has no mvhd box, so the old
    # duration-before-decode order raised ValueError and contradicted
    # the 'any ffmpeg-supported codec' claim
    samples = decode_video_samples(data)
    try:
        duration = decode_mp4_duration(data)
    except ValueError:
        duration = max((ts for ts, _ in samples), default=0.0)
    frame_means = []
    for _, payload in samples:
        w, h, ch, px = decode_png(payload)
        frame_means.append(float(np.frombuffer(px, dtype=np.uint8).mean()) / 255.0)
    arr = np.asarray(frame_means)
    feat = [
        duration,
        float(len(samples)),
        arr[0],
        arr[len(arr) // 2],
        arr[-1],
        float(arr.mean()),
        float(arr.std()),
        int(n_bytes) / 1024.0,
    ]
    return duration, (feat + [0.0] * dim)[:dim]


def extract_media_features(
    df: DataFrame, id_col: str = "doc_id", feature_dim: int = 8, allow_stub: bool = False
) -> DataFrame:
    """Decode + feature-extract media via Arrow-batched mapInPandas.

    REAL decoding per modality: images -> decoded width/height and
    per-channel pixel statistics; audio -> decoded duration, RMS, peak;
    video -> real container duration AND per-frame pixel statistics
    decoded from the stts/stsz/mdat sample table (round 5 — formerly
    the one stubbed payload). Videos without a sample table
    (metadata-only headers) raise by default; ``allow_stub=True``
    degrades them to duration+size features instead.
    """

    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.col("content"),
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            widths: list[int | None] = []
            heights: list[int | None] = []
            durations: list[float | None] = []
            feats: list[list[float]] = []
            for mtype, content, n_bytes in zip(
                pdf["media_type"], pdf["content"], pdf["n_bytes"]
            ):
                raw = bytes(content)
                if mtype.startswith("image/"):
                    w, h, feat = _image_feature(raw, feature_dim)
                    widths.append(w)
                    heights.append(h)
                    durations.append(None)
                elif mtype.startswith("audio/"):
                    duration, feat = _audio_feature(raw, feature_dim)
                    widths.append(None)
                    heights.append(None)
                    durations.append(duration)
                else:  # video: real container metadata AND frame pixels
                    try:
                        duration, feat = _video_feature(
                            raw, int(n_bytes), feature_dim
                        )
                    except ValueError:
                        # metadata-only container (no sample table)
                        if not allow_stub:
                            raise
                        try:
                            duration = decode_mp4_duration(raw)
                        except ValueError:
                            duration = 0.0  # non-BMFF, undecodable
                        feat = (
                            [duration, int(n_bytes) / 1024.0] + [0.0] * feature_dim
                        )[:feature_dim]
                    widths.append(None)
                    heights.append(None)
                    durations.append(duration)
                feats.append(feat)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_sec": pd.array(durations, dtype="Float64"),
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
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, allow_stub: bool = True
) -> DataFrame:
    """REAL image resize via Arrow-batched mapInPandas: decode (PIL or
    pure-Python PNG), nearest-neighbor resample to ``width x height``,
    re-encode as PNG. 1 row in -> 1 row out; the image-type filter is
    pushed before the Python stage. ``allow_stub=True`` passes
    undecodable payloads through as byte-tiles (flagged by the legacy
    fixture tests); ``allow_stub=False`` raises on them.
    """
    n_out = width * height
    src = df.filter(F.col("media_meta.media_type").startswith("image/")).select(
        F.col("doc_id"), F.col("content")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = []
            for content in pdf["content"]:
                raw = bytes(content)
                try:
                    w, h, ch, px = _decode_image(raw)
                    out_px = resize_nearest(px, w, h, ch, width, height)
                    resized.append(encode_png(width, height, out_px, channels=ch))
                except ValueError:
                    if not allow_stub:
                        raise
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
    df: DataFrame, every_n_seconds: float = 1.0, allow_stub: bool = False
) -> DataFrame:
    """Sample frames from video rows via Arrow-batched mapInPandas:
    1 row in -> N frame rows out (the flatMap batch shape frame
    extraction needs), with REAL payloads as of round 5: the container
    codec (imagecodec.decode_video_samples: PyAV for real
    H.264/H.265/VP9 when installed, else the stdlib path) walks the genuine
    stts/stsz/mdat sample table, picks the latest sample at or before
    each sampling instant, and decodes its PNG payload — ``frame`` is
    the encoded sample, ``width``/``height``/``px_mean`` come from the
    decoded pixels. Codec coverage is PNG-samples-in-BMFF (the
    motion-JPEG layout with a pure-stdlib intra codec); H.264 streams
    would still need an external decoder. Containers WITHOUT a sample
    table (metadata-only headers): ``allow_stub=False`` (default)
    raises, ``allow_stub=True`` skips them."""
    src = df.filter(F.col("media_meta.media_type").startswith("video/")).select(
        F.col("doc_id"), F.col("content"), F.col("media_meta.n_bytes").alias("n_bytes")
    )
    step = float(every_n_seconds)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bisect

        for pdf in it:
            ids, idxs, tss, frames = [], [], [], []
            ws, hs, means = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                raw = bytes(content)
                try:
                    samples = decode_video_samples(raw)
                except ValueError:
                    if not allow_stub:
                        raise
                    continue  # metadata-only container: no frames to emit
                try:
                    duration = decode_mp4_duration(raw)
                except ValueError:
                    # non-BMFF container decoded by the av backend
                    # (ADVICE r6): derive duration from the samples
                    duration = max((t for t, _ in samples), default=0.0)
                sample_ts = [t for t, _ in samples]
                n_out = int(duration / step) + 1
                for i in range(n_out):
                    t = i * step
                    j = max(0, bisect.bisect_right(sample_ts, t) - 1)
                    payload = samples[j][1]
                    w, h, ch, px = decode_png(payload)
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(t)
                    frames.append(payload)
                    ws.append(w)
                    hs.append(h)
                    means.append(float(np.frombuffer(px, dtype=np.uint8).mean()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "ts_sec": tss,
                    "frame": frames,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "px_mean": pd.array(means, dtype="Float64"),
                }
            )

    return src.mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)


RESAMPLED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_rate", T.IntegerType()),
        T.StructField("dst_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resample_audio(
    df: DataFrame, target_rate: int = 16000, allow_stub: bool = True
) -> DataFrame:
    """REAL audio resample via Arrow-batched mapInPandas: decode PCM16
    WAV (pure-stdlib codec), linear-interpolate to ``target_rate`` with
    numpy (np.interp over the time grid — the standard zero-dependency
    resampler; fine for features, use a windowed-sinc library offline
    for hi-fi), re-encode WAV. 1 row in -> 1 row out; the audio-type
    filter is pushed before the Python stage so image/video bytes
    never cross into Arrow. ``allow_stub=False`` raises on undecodable
    payloads instead of passing them through unchanged."""
    import numpy as _np

    src = df.filter(F.col("media_meta.media_type").startswith("audio/")).select(
        F.col("doc_id"), F.col("content")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rates, out_n, out_bytes = [], [], []
            for content in pdf["content"]:
                raw = bytes(content)
                try:
                    rate, n, samples = decode_wav(raw)
                    arr = _np.asarray(samples, dtype=_np.float64)
                    dst_n = max(1, int(round(n * target_rate / rate)))
                    t_dst = _np.arange(dst_n) * (rate / target_rate)
                    res = _np.interp(t_dst, _np.arange(n), arr)
                    pcm = _np.clip(_np.rint(res), -32768, 32767).astype(int)
                    out_rates.append(rate)
                    out_n.append(dst_n)
                    out_bytes.append(encode_wav(list(pcm), sample_rate=target_rate))
                except (ValueError, struct.error):
                    if not allow_stub:
                        raise
                    out_rates.append(0)
                    out_n.append(0)
                    out_bytes.append(raw)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_rate": out_rates,
                    "dst_rate": target_rate,
                    "n_samples": out_n,
                    "content": out_bytes,
                }
            )

    return src.mapInPandas(batches, schema=RESAMPLED_AUDIO_SCHEMA)


IMAGE_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("ahash", T.LongType()),
    ]
)

_AHASH_GRID = 8  # 8x8 -> 64-bit hash


def _ahash_bits(data: bytes) -> tuple[int, int, int]:
    """(width, height, 64-bit average-hash) for one decoded image.

    Classic aHash (Krawetz): sample the image on an 8x8 grid
    (nearest-neighbor at cell centers — exact and defined for ANY
    image size, unlike block means on images smaller than the grid),
    take per-sample luminance as the integer R+G+B sum (monotone in
    luminance; avoids a rounding division), and set bit (y*8+x) when
    the sample exceeds the 64-sample mean. Brightness-invariant by
    construction: adding a constant to every pixel shifts samples and
    mean together, leaving the bit pattern unchanged (pinned in
    tests/test_multimodal.py)."""
    w, h, ch, px = _decode_image(data)
    g = _AHASH_GRID
    samples = []
    for y in range(g):
        sy = (2 * y + 1) * h // (2 * g)
        for x in range(g):
            sx = (2 * x + 1) * w // (2 * g)
            base = (sy * w + sx) * ch
            samples.append(sum(px[base : base + ch]))
    # integer threshold: bit set iff g*g*sample > sum(samples) — exact,
    # no float mean
    total = sum(samples)
    n = g * g
    bits = 0
    for j, s in enumerate(samples):
        if n * s > total:
            bits |= 1 << j
    if bits >= 1 << 63:  # two's-complement into int64
        bits -= 1 << 64
    return w, h, bits


def image_ahash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Perceptual average-hash per IMAGE row (non-image media rows are
    filtered JVM-side BEFORE Python, so the Arrow boundary only
    carries decodable payloads — the §2.8 type-filter-below-Python
    rule). Returns (doc_id, width, height, ahash BIGINT)."""
    src = df.filter(
        F.col("media_meta.media_type").startswith("image/")
    ).select(F.col(id_col).alias("doc_id"), F.col("content"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_ahash_bits(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array([r[0] for r in rows], dtype="Int32"),
                    "height": pd.array([r[1] for r in rows], dtype="Int32"),
                    "ahash": pd.array([r[2] for r in rows], dtype="Int64"),
                }
            )

    return src.mapInPandas(batches, schema=IMAGE_AHASH_SCHEMA)
