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
    with pytest.raises(NotImplementedError):
        extract_media_features(media_df, allow_stub=False)
    with pytest.raises(NotImplementedError):
        resize_images(media_df, 128, 128)
