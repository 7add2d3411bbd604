"""ML feature/train/eval pipeline (SURVEY.md §2.9 M1-M12, modernized).

Reference parity with the deliberate fixes SURVEY.md §2.9/§4.3 calls out:
- ``RFormula`` fit once on TRAIN only (the reference refits on full/
  train/test at ``Databricks Notebook.py:747-756`` — leakage-prone);
- ``UnivariateFeatureSelector`` replaces the deprecated ChiSqSelector
  (``:773-787``, percentile 0.9);
- DataFrame-native evaluators replace the mllib RDD adapters
  (``:836-862`` maps rows through Python lambdas per partition — the
  only executor-side Python in the reference; these stay in the JVM).

Models and hyperparameters mirror the reference exactly:
LogisticRegression(maxIter=10, regParam=0.01) ``:805``,
RandomForestClassifier(numTrees=50) ``:873``, GBTClassifier() ``:941``,
randomSplit([0.7, 0.3], seed=7) ``:737``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import (
    GBTClassifier,
    LogisticRegression,
    RandomForestClassifier,
)
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.ml.feature import (
    OneHotEncoder,
    RFormula,
    StringIndexer,
    UnivariateFeatureSelector,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 7  # reference :737


@dataclass
class FitResult:
    name: str
    model: object
    metrics: dict[str, float] = field(default_factory=dict)


def featurize(
    basetable: DataFrame,
    label_col: str = "label",
    id_col: str = "business_id",
    categorical_cols: tuple[str, ...] = ("city", "state"),
    select_percentile: float | None = 0.9,
) -> tuple[DataFrame, DataFrame, PipelineModel]:
    """Index+one-hot categoricals (M1-M3), RFormula-assemble (M5),
    chi2-select top percentile (M6), 70/30 split (M4).

    Returns (train, test, fitted feature PipelineModel); both outputs
    carry ``features`` + ``label`` ready for any classifier.
    """
    base = basetable.withColumn(label_col, F.col(label_col).cast("double"))
    train_raw, test_raw = base.randomSplit([0.7, 0.3], seed=SEED)  # :737

    # drop string columns that are single-valued ON TRAIN: they carry no
    # signal and RFormula's internal StringIndexer rejects them (the
    # stats must come from the split the formula is fit on). One
    # aggregation job; approx_count_distinct is exact enough for a
    # ">= 2 distinct" decision and cheap at any scale.
    str_cols = [f.name for f in base.schema.fields
                if f.dataType.typeName() == "string" and f.name != id_col]
    if str_cols:
        counts = train_raw.agg(
            *[F.approx_count_distinct(c).alias(c) for c in str_cols]
        ).first()
        degenerate = [c for c in str_cols if counts[c] < 2]
        if degenerate:
            train_raw = train_raw.drop(*degenerate)
            test_raw = test_raw.drop(*degenerate)

    cats = [c for c in categorical_cols if c in train_raw.columns]
    stages = []
    for c in cats:
        stages.append(StringIndexer(inputCol=c, outputCol=f"{c}Ind", handleInvalid="keep"))
    if cats:
        stages.append(
            OneHotEncoder(
                inputCols=[f"{c}Ind" for c in cats],
                outputCols=[f"{c}Vec" for c in cats],
            )
        )
    # RFormula over everything except id + raw categorical originals
    formula = f"{label_col} ~ . - {id_col}" + "".join(f" - {c} - {c}Ind" for c in cats)
    stages.append(
        RFormula(formula=formula, featuresCol="rawFeatures", labelCol="labelCol")
    )
    if select_percentile is not None:
        sel = UnivariateFeatureSelector(
            featuresCol="rawFeatures",
            outputCol="features",
            labelCol="labelCol",
            selectionMode="percentile",
        )
        sel.setFeatureType("categorical").setLabelType("categorical")
        sel.setSelectionThreshold(select_percentile)
        stages.append(sel)

    pipe = Pipeline(stages=stages)
    model = pipe.fit(train_raw)  # fit ONCE on train (leakage fix)
    feat_col = "features" if select_percentile is not None else "rawFeatures"

    def finalize(df: DataFrame) -> DataFrame:
        return model.transform(df).select(
            F.col(feat_col).alias("features"), F.col("labelCol").alias("label")
        )

    return finalize(train_raw), finalize(test_raw), model


def evaluate_model(model, df: DataFrame, prefix: str) -> dict[str, float]:
    """AUC + accuracy + weighted precision/recall/F1, DataFrame-native
    (replaces mllib BinaryClassificationMetrics/MulticlassMetrics,
    reference :836-862)."""
    preds = model.transform(df)
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    ).evaluate(preds)
    multi = MulticlassClassificationEvaluator(labelCol="label", predictionCol="prediction")
    out = {f"{prefix}_auc": auc}
    for metric in ("accuracy", "weightedPrecision", "weightedRecall", "f1"):
        out[f"{prefix}_{metric}"] = multi.setMetricName(metric).evaluate(preds)
    return out


def train_models(train: DataFrame, test: DataFrame) -> list[FitResult]:
    """Fit the reference's three classifiers (M7-M9) and evaluate on
    train and test (M10-M12)."""
    specs = [
        ("logistic_regression", LogisticRegression(maxIter=10, regParam=0.01)),  # :805
        ("random_forest", RandomForestClassifier(numTrees=50, seed=SEED)),  # :873
        ("gbt", GBTClassifier(seed=SEED)),  # :941
    ]
    results = []
    for name, est in specs:
        model = est.fit(train)
        metrics = evaluate_model(model, train, "train") | evaluate_model(model, test, "test")
        results.append(FitResult(name=name, model=model, metrics=metrics))
    return results


def feature_importances(model, feature_names: list[str]) -> list[tuple[str, float]]:
    """Sorted (name, importance) pairs for tree models (reference
    ExtractFeatureImp ``:885-893`` — driver-side prettifier)."""
    imp = model.featureImportances
    pairs = [(feature_names[i] if i < len(feature_names) else f"f{i}", float(v))
             for i, v in zip(imp.indices, imp.values)]
    return sorted(pairs, key=lambda p: -p[1])


def feature_names_from_metadata(df: DataFrame, features_col: str = "features") -> list[str]:
    """Feature names in vector-slot order, read from the ``ml_attr``
    column metadata Spark's feature stages attach — the same source the
    reference's ExtractFeatureImp walks (``Databricks Notebook.py:
    885-893``). Slots without a name fall back to ``f<idx>``."""
    meta = df.schema[features_col].metadata
    attrs = meta.get("ml_attr", {}).get("attrs", {})
    by_idx: dict[int, str] = {}
    n = meta.get("ml_attr", {}).get("num_attrs", 0)
    for group in attrs.values():
        for a in group:
            by_idx[a["idx"]] = a.get("name", f"f{a['idx']}")
            n = max(n, a["idx"] + 1)
    return [by_idx.get(i, f"f{i}") for i in range(n)]
