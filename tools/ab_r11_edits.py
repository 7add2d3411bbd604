#!/usr/bin/env python
"""Same-session alternating A/B for the two r11 post-resume edits
(adamic-adar join order + CMS user-grain hashing) — the only
methodology that survives this box's co-tenant bursts: both variants
run interleaved in one JVM, so load hits both columns equally and the
RATIO stays meaningful (the bench_history/r11.json 'isolated' caveat).

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_r11_edits.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.operators.cache import (
    release_all_caches,
    release_caches,
)
from big_data_tools_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def adamic_before(spark):
    from big_data_tools_spark.queries.graph import _AA_TOPK, _repeat_und
    from big_data_tools_spark.operators.portablemath import pln_sql

    und = _repeat_und(spark, SF_DIR).persist()
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    il = deg.filter(F.col("d") >= 2).select(
        "node",
        F.round(1.0 / F.round(F.expr(pln_sql("d")), 6), 6).alias("w"),
    )
    x = adj.select("node", F.col("nbr").alias("pa"))
    y = adj.select("node", F.col("nbr").alias("pb"))
    wedges = (
        x.join(y, "node")
        .filter(F.col("pa") < F.col("pb"))
        .join(il, "node")
        .select("pa", "pb", "w")
    )
    cand = (
        wedges.join(
            und,
            (wedges.pa == und.a) & (wedges.pb == und.b),
            "left_anti",
        )
        .groupBy("pa", "pb")
        .agg(
            F.round(F.sum(F.col("w").cast("decimal(28,8)")).cast("double"), 6)
            .cast("double")
            .alias("aa_score"),
            F.count(F.lit(1)).alias("n_common"),
        )
    )
    out = cand.orderBy(F.desc("aa_score"), F.asc("pa"), F.asc("pb")).limit(_AA_TOPK)
    return out, und


def adamic_after(spark):
    from big_data_tools_spark.queries.graph import copurchase_adamic_adar

    return copurchase_adamic_adar(spark, SF_DIR), None


def cms_before(spark):
    from big_data_tools_spark.operators.sampling import cms_positions
    from big_data_tools_spark.queries.scale import _CMS_D, _CMS_TOP, _CMS_W

    events = load_table(spark, SF_DIR, "events")

    def positions(key):
        return cms_positions(key, _CMS_D, _CMS_W)

    pos = events.select(positions(F.col("user_id")).alias("p")).select("p.r", "p.b")
    sketch = (
        pos.groupBy("r", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist()
    )
    exact = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    top = exact.orderBy(F.desc("exact_count"), F.asc("user_id")).limit(_CMS_TOP)
    probe = top.select(
        "user_id", "exact_count", positions(F.col("user_id")).alias("p")
    ).select("user_id", "exact_count", "p.r", "p.b")
    est = (
        probe.join(F.broadcast(sketch), ["r", "b"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
    )
    typed = events.select(
        "event_type", positions(F.col("user_id")).alias("p")
    ).select("event_type", "p.r", "p.b")
    partials = typed.groupBy("event_type", "r", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    merged = partials.groupBy("r", "b").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    n_match = merged.join(sketch, ["r", "b", "cnt"]).agg(
        F.count(F.lit(1)).alias("n_match")
    )
    n_cells = sketch.agg(F.count(F.lit(1)).alias("n_cells"))
    n_merged = merged.agg(F.count(F.lit(1)).alias("n_merged"))
    mi = (
        n_match.crossJoin(F.broadcast(n_cells))
        .crossJoin(F.broadcast(n_merged))
        .select(
            (
                (F.col("n_match") == F.col("n_cells"))
                & (F.col("n_merged") == F.col("n_cells"))
            ).alias("merge_identity_ok")
        )
    )
    out = est.crossJoin(F.broadcast(mi)).select(
        "user_id",
        "exact_count",
        "cms_est",
        (F.col("cms_est") - F.col("exact_count")).alias("overestimate"),
        "merge_identity_ok",
    )
    return out, sketch


def cms_after(spark):
    from big_data_tools_spark.queries.scale import events_cms_heavy_hitters

    return events_cms_heavy_hitters(spark, SF_DIR), None


def time_one(spark, fn):
    df, extra = fn(spark)
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    release_caches(df)
    if extra is not None:
        release_caches(extra)
    release_all_caches()
    return dt, n


def main() -> None:
    spark = get_spark(app_name="ab-r11-edits")
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    results: dict = {"sf_dir": SF_DIR}
    for name, before, after in (
        ("copurchase_adamic_adar", adamic_before, adamic_after),
        ("events_cms_heavy_hitters", cms_before, cms_after),
    ):
        time_one(spark, before)  # warm both variants once
        time_one(spark, after)
        b_s, a_s = [], []
        for _ in range(ROUNDS):
            dt_b, n_b = time_one(spark, before)
            dt_a, n_a = time_one(spark, after)
            assert n_b == n_a, (name, n_b, n_a)
            b_s.append(round(dt_b, 3))
            a_s.append(round(dt_a, 3))
        results[name] = {
            "before_sec": b_s,
            "after_sec": a_s,
            "ratio_best": round(min(a_s) / min(b_s), 3),
        }
        print(f"# {name}: before {b_s} after {a_s}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
