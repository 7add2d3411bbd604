"""Multimodal plumbing tests: binary columns + metadata struct + Arrow
mapInPandas feature extraction (decode stubbed — media libs absent)."""

from __future__ import annotations

import pytest

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.operators.multimodal import (
    MEDIA_FEATURE_SCHEMA,
    attach_fake_media,
    extract_media_features,
    resize_images,
)


@pytest.fixture(scope="module")
def media_df(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    return attach_fake_media(docs)


def test_media_columns_schema(media_df):
    dtypes = dict(media_df.dtypes)
    assert dtypes["content"] == "binary"
    assert dtypes["media_meta"].startswith("struct<media_type:string")
    row = media_df.select("media_meta.n_bytes").first()
    assert row["n_bytes"] == 64  # 4 x md5 hex -> 64 bytes


def test_extract_features_schema_and_determinism(media_df):
    feats = extract_media_features(media_df, feature_dim=8)
    assert feats.schema == MEDIA_FEATURE_SCHEMA
    rows1 = sorted(feats.collect(), key=lambda r: r["doc_id"])
    rows2 = sorted(extract_media_features(media_df, feature_dim=8).collect(),
                   key=lambda r: r["doc_id"])
    assert rows1 == rows2
    assert all(len(r["feature"]) == 8 for r in rows1)
    assert all(0.0 <= v <= 1.0 for r in rows1 for v in r["feature"])


def test_real_decoder_paths_clearly_stubbed(media_df):
    from big_data_tools_spark.operators.multimodal import sample_video_frames

    with pytest.raises(NotImplementedError):
        extract_media_features(media_df, allow_stub=False)
    with pytest.raises(NotImplementedError):
        resize_images(media_df, 128, 128, allow_stub=False)
    with pytest.raises(NotImplementedError):
        sample_video_frames(media_df, allow_stub=False)


def test_resize_images_schema_and_determinism(spark, sf_smoke):
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.multimodal import (
        attach_fake_media,
        resize_images,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    media = attach_fake_media(docs)
    out = resize_images(media, width=8, height=4)
    rows = out.collect()
    n_images = media.filter("media_meta.media_type like 'image/%'").count()
    assert len(rows) == n_images > 0
    assert all(r["n_bytes"] == 8 * 4 == len(bytes(r["content"])) for r in rows)
    again = {r["doc_id"]: bytes(r["content"]) for r in resize_images(media, 8, 4).collect()}
    assert {r["doc_id"]: bytes(r["content"]) for r in rows} == again


def test_sample_video_frames_fan_out(spark, sf_smoke):
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.multimodal import (
        attach_fake_media,
        sample_video_frames,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    media = attach_fake_media(docs)
    out = sample_video_frames(media, every_n_seconds=2.0)
    rows = out.collect()
    vids = media.filter("media_meta.media_type like 'video/%'")
    n_videos = vids.count()
    assert n_videos > 0
    # 1 -> N fan-out: every video contributes duration//2 + 1 frames
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert len(per_doc) == n_videos
    for vid in vids.select("doc_id", "media_meta.n_bytes").collect():
        expect = int(int(vid["n_bytes"]) % 30 + 1) // 2 + 1
        got = len(per_doc[vid["doc_id"]])
        assert got == expect, (vid["doc_id"], got, expect)
    # frame 0 is the unrotated payload
    f0 = [r for r in rows if r["frame_idx"] == 0][0]
    src = {r["doc_id"]: bytes(r["content"]) for r in media.select("doc_id", "content").collect()}
    assert bytes(f0["frame"]) == src[f0["doc_id"]]
