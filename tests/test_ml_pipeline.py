"""ML pipeline smoke (SURVEY.md §5.2.4): featurize + fit + evaluate on a
seeded synthetic basetable; metrics must land in a sane band.

The synthetic basetable plants a signal (label correlates with
review_count and a dummy column) so AUC must beat chance by a wide
margin — reproducing the *shape* of the reference's result
(train/test AUC ~0.96-0.99, BASELINE.md) without its data.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from big_data_tools_spark.ml.pipeline import featurize, train_models


@pytest.fixture(scope="module")
def basetable(spark):
    # 400 businesses, deterministic columns; label = f(review_count, dummy) + noise
    df = spark.range(400).select(
        F.concat(F.lit("b"), F.col("id")).alias("business_id"),
        (F.col("id") % 7).cast("double").alias("review_count"),
        (F.col("id") % 2).cast("int").alias("has_delivery_dummy"),
        ((F.col("id") * 37) % 100).cast("double").alias("tip_count"),
        F.when(F.col("id") % 3 == 0, "Springfield")
        .when(F.col("id") % 3 == 1, "Shelbyville")
        .otherwise("Capital City")
        .alias("city"),
        F.when(F.col("id") % 2 == 0, "IL").otherwise("IN").alias("state"),
    )
    signal = (F.col("review_count") >= 4) | (F.col("has_delivery_dummy") == 1)
    noise = (F.xxhash64("business_id") % 10) == 0  # ~10% flips
    return df.withColumn("label", (signal != noise).cast("int"))


def test_featurize_and_train(basetable):
    train, test, feat_model = featurize(basetable, select_percentile=0.9)
    assert train.columns == ["features", "label"]
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 400
    assert 0.6 < n_train / 400 < 0.8  # 70/30 split, seed 7

    results = train_models(train, test)
    names = [r.name for r in results]
    assert names == ["logistic_regression", "random_forest", "gbt"]
    for r in results:
        assert 0.8 < r.metrics["train_auc"] <= 1.0, (r.name, r.metrics)
        assert 0.75 < r.metrics["test_auc"] <= 1.0, (r.name, r.metrics)
        assert 0.0 < r.metrics["test_f1"] <= 1.0


def test_featurize_without_selector(basetable):
    train, test, _ = featurize(basetable, select_percentile=None)
    assert "features" in train.columns
    assert train.count() > 0
