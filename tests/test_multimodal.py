"""Multimodal operator tests: binary columns + metadata struct + Arrow
mapInPandas extraction with REAL decoding (pure-stdlib PNG/WAV/MP4
codecs — see tests/test_imagecodec.py for the codec layer itself).
Decoded dimensions/durations are asserted against the known fixture
formulas, so a decoder regression (not just a plumbing one) fails."""

from __future__ import annotations

import pytest

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.operators.imagecodec import decode_png
from big_data_tools_spark.operators.multimodal import (
    MEDIA_FEATURE_SCHEMA,
    attach_fake_media,
    extract_media_features,
    resize_images,
    sample_video_frames,
    synth_media_bytes,
)


@pytest.fixture(scope="module")
def media_df(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    return attach_fake_media(docs)


def test_media_columns_are_valid_media(media_df):
    dtypes = dict(media_df.dtypes)
    assert dtypes["content"] == "binary"
    assert dtypes["media_meta"].startswith("struct<media_type:string")
    magic = {"image/png": b"\x89PNG", "audio/wav": b"RIFF", "video/mp4": None}
    for r in media_df.select("media_meta.media_type", "content").collect():
        raw = bytes(r["content"])
        if magic[r["media_type"]]:
            assert raw.startswith(magic[r["media_type"]]), r["media_type"]
        else:
            assert raw[4:8] == b"ftyp"  # MP4 box framing


def test_extract_features_real_decoded_values(media_df):
    feats = extract_media_features(media_df, feature_dim=8)
    assert feats.schema == MEDIA_FEATURE_SCHEMA
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert rows
    for doc_id, r in rows.items():
        kind = doc_id % 3
        if kind == 0:  # image: decoded dims must match the fixture formula
            assert (r["width"], r["height"]) == (8 + doc_id % 9, 6 + doc_id % 7)
            assert r["duration_sec"] is None
            assert all(0.0 <= v <= 1.0 for v in r["feature"])
        elif kind == 1:  # audio: decoded duration = n_samples / rate
            n = 400 + (doc_id % 10) * 200
            assert r["duration_sec"] == pytest.approx(n / 8000.0)
            assert r["width"] is None and r["height"] is None
        else:  # video: real mvhd container duration
            assert r["duration_sec"] == pytest.approx(float(doc_id % 30 + 1))
    # deterministic across runs
    again = {r["doc_id"]: r for r in extract_media_features(media_df, feature_dim=8).collect()}
    assert rows == again


def test_video_frame_payloads_decode_real_pixels(media_df):
    """Round 5: frame payloads are REAL — every sampled frame is a
    decodable PNG whose pixels match the fixture formula exactly, and
    metadata-only containers (no sample table) raise by default."""
    from big_data_tools_spark.operators.multimodal import (
        _FRAME_H,
        _FRAME_W,
        _synth_frame_png,
    )

    rows = sample_video_frames(media_df, every_n_seconds=2.0).collect()
    assert rows
    for r in rows:
        w, h, ch, px = decode_png(bytes(r["frame"]))
        assert (w, h, ch) == (_FRAME_W, _FRAME_H, 3)
        assert (r["width"], r["height"]) == (w, h)
        # sampling at t=2i with 1 fps frames picks source frame 2i,
        # clamped to the last frame when t reaches the mvhd duration
        n_frames = int(r["doc_id"]) % 30 + 1
        src_frame_idx = min(2 * r["frame_idx"], n_frames - 1)
        expect = decode_png(_synth_frame_png(int(r["doc_id"]), src_frame_idx))[3]
        assert px == expect
        assert r["px_mean"] == pytest.approx(
            sum(expect) / len(expect)
        )

    # a metadata-only container (legacy header, no stbl/mdat) raises
    # unless stubs are explicitly allowed
    from big_data_tools_spark.operators.imagecodec import encode_mp4_header
    from big_data_tools_spark.operators.multimodal import MEDIA_META_SCHEMA
    from pyspark.sql import functions as F, types as T

    spark = media_df.sparkSession
    legacy = spark.createDataFrame(
        [(1, bytearray(encode_mp4_header(3.0)), ("video/mp4", "synthetic://1", 0))],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
                T.StructField("media_meta", MEDIA_META_SCHEMA),
            ]
        ),
    )
    with pytest.raises(Exception, match="sample table"):
        sample_video_frames(legacy).collect()
    assert sample_video_frames(legacy, allow_stub=True).collect() == []
    with pytest.raises(Exception, match="sample table"):
        extract_media_features(legacy).collect()
    degraded = extract_media_features(legacy, allow_stub=True).collect()
    assert len(degraded) == 1 and degraded[0]["duration_sec"] == pytest.approx(3.0)


def test_resize_images_real_decode_and_resample(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(60)
    media = attach_fake_media(docs)
    out = resize_images(media, width=8, height=4, allow_stub=False)
    rows = out.collect()
    n_images = media.filter("media_meta.media_type like 'image/%'").count()
    assert len(rows) == n_images > 0
    for r in rows:
        w, h, ch, px = decode_png(bytes(r["content"]))  # output is a real PNG
        assert (w, h, ch) == (8, 4, 3)
        assert len(px) == 8 * 4 * 3
    # nearest-neighbor is pinned against a driver-side reference resize
    from big_data_tools_spark.operators.imagecodec import resize_nearest

    doc_id = rows[0]["doc_id"]
    _, src_png = synth_media_bytes(int(doc_id))
    sw, sh, sch, spx = decode_png(src_png)
    expect = resize_nearest(spx, sw, sh, sch, 8, 4)
    got = decode_png(bytes([r for r in rows if r["doc_id"] == doc_id][0]["content"]))[3]
    assert got == expect


def test_sample_video_frames_fan_out_from_real_duration(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(60)
    media = attach_fake_media(docs)
    rows = sample_video_frames(media, every_n_seconds=2.0).collect()
    vids = media.filter("media_meta.media_type like 'video/%'")
    n_videos = vids.count()
    assert n_videos > 0
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc) == n_videos
    for vid in vids.select("doc_id").collect():
        # frame count comes from the REAL decoded mvhd duration
        duration = vid["doc_id"] % 30 + 1
        assert len(per_doc[vid["doc_id"]]) == int(duration / 2.0) + 1
    # frame 0 is the decoded first PNG sample of its container
    from big_data_tools_spark.operators.multimodal import _synth_frame_png

    f0 = [r for r in rows if r["frame_idx"] == 0][0]
    assert bytes(f0["frame"]) == _synth_frame_png(int(f0["doc_id"]), 0)


def test_resample_audio_preserves_duration_and_values(spark):
    """Resampling a known triangle wave: duration preserved within one
    sample, and values on coincident grid points interpolate exactly."""
    from big_data_tools_spark.operators.imagecodec import decode_wav, encode_wav
    from big_data_tools_spark.operators.multimodal import (
        MEDIA_META_SCHEMA,
        resample_audio,
    )
    from pyspark.sql import functions as F

    rate, dur_s = 8000, 0.05
    n = int(rate * dur_s)
    tri = [((i % 100) - 50) * 600 for i in range(n)]
    wav = encode_wav(tri, sample_rate=rate)
    df = spark.createDataFrame([(1, wav)], "doc_id long, content binary").select(
        "doc_id",
        "content",
        F.struct(
            F.lit("audio/wav").alias("media_type"),
            F.lit(len(wav)).cast("long").alias("n_bytes"),
        ).alias("media_meta"),
    )
    out = resample_audio(df, target_rate=16000, allow_stub=False).collect()[0]
    assert out["src_rate"] == 8000 and out["dst_rate"] == 16000
    r2, n2, samples2 = decode_wav(bytes(out["content"]))
    assert r2 == 16000 and n2 == out["n_samples"]
    # duration preserved within one output sample
    assert abs(n2 / 16000 - n / 8000) <= 1 / 16000 + 1e-12
    # 2x upsampling: every even output sample lands ON an input sample
    for j in range(0, min(n2, 60), 2):
        assert samples2[j] == tri[j // 2]


def test_resample_audio_filters_non_audio_rows(spark, sf_smoke):
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.multimodal import (
        attach_fake_media,
        resample_audio,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    media = attach_fake_media(docs, id_col="doc_id")
    out = resample_audio(media).collect()
    n_audio = media.filter("media_meta.media_type = 'audio/wav'").count()
    assert len(out) == n_audio > 0
    assert all(r["dst_rate"] == 16000 for r in out)


# ------------------------------------------------------- aHash (round 8)


def test_ahash_deterministic_and_planted_duplicates(spark):
    """Identical pixel content -> identical ahash; the grouped query
    reports the planted duplicate as one group of size 2."""
    from big_data_tools_spark.operators.imagecodec import encode_png
    from big_data_tools_spark.operators.multimodal import image_ahash

    w, h = 11, 9
    px = bytes((x * 5 + y * 3 + c) % 256 for y in range(h) for x in range(w) for c in range(3))
    other = bytes((x * 7 + y * 13 + c * 2) % 256 for y in range(h) for x in range(w) for c in range(3))
    png, png_dup, png_other = encode_png(w, h, px, 3), encode_png(w, h, px, 3), encode_png(w, h, other, 3)
    df = spark.createDataFrame(
        [(1, png), (2, png_dup), (3, png_other)],
        "doc_id long, content binary",
    ).selectExpr(
        "doc_id",
        "content",
        "named_struct('media_type', 'image/png', 'source_uri', 's', "
        "'n_bytes', CAST(length(content) AS LONG)) AS media_meta",
    )
    out = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_ahash_brightness_invariance(spark):
    """aHash keys on structure, not exposure: adding a constant to all
    pixels (no wraparound) must not change the hash — the perceptual
    property byte-hash dedup lacks."""
    from big_data_tools_spark.operators.imagecodec import encode_png
    from big_data_tools_spark.operators.multimodal import image_ahash

    w, h = 10, 8
    base = [(x * 9 + y * 7 + c) % 120 for y in range(h) for x in range(w) for c in range(3)]
    brighter = [v + 80 for v in base]  # max 119 + 80 < 256: no wrap
    df = spark.createDataFrame(
        [(1, encode_png(w, h, bytes(base), 3)), (2, encode_png(w, h, bytes(brighter), 3))],
        "doc_id long, content binary",
    ).selectExpr(
        "doc_id",
        "content",
        "named_struct('media_type', 'image/png', 'source_uri', 's', "
        "'n_bytes', CAST(length(content) AS LONG)) AS media_meta",
    )
    out = {r["doc_id"]: r["ahash"] for r in image_ahash(df).collect()}
    assert out[1] == out[2]


def test_ahash_dedup_query_filters_to_images(spark, sf_smoke):
    """Only image rows cross the Arrow boundary; group stats cover
    exactly the image subset of the synthetic media."""
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.multimodal import attach_fake_media
    from big_data_tools_spark.queries.registry import all_queries

    rows = all_queries()["multimodal_image_ahash_dedup"].fn(spark, sf_smoke).collect()
    docs = load_table(spark, sf_smoke, "documents").select("doc_id")
    n_images = (
        attach_fake_media(docs)
        .filter("media_meta.media_type = 'image/png'")
        .count()
    )
    assert sum(r["group_size"] for r in rows) == n_images > 0
    for r in rows:
        assert r["min_doc_id"] <= r["max_doc_id"]
        assert 8 <= r["min_width"] <= r["max_width"] <= 16
