"""Sink round-trip tests: partitioned parquet write -> read-back equality."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_tools_spark.io.sinks import read_back, write_parquet
from big_data_tools_spark.io.sources import load_table
from big_data_tools_spark.queries import get


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="bdt_sink_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_parquet_roundtrip(spark, sf_smoke, outdir):
    df = get("pricing_summary").fn(spark, sf_smoke)
    write_parquet(df, outdir)
    back = read_back(spark, outdir)
    assert sorted(back.columns) == sorted(df.columns)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_partitioned_write_produces_partition_dirs(spark, sf_smoke, outdir):
    df = get("priority_recode").fn(spark, sf_smoke)
    write_parquet(df, outdir, partition_by=["urgency"])
    subdirs = {p for p in os.listdir(outdir) if p.startswith("urgency=")}
    assert subdirs == {"urgency=high", "urgency=medium", "urgency=low"}
    back = read_back(spark, outdir)
    assert back.count() == df.count()


def test_bucketed_tables_join_without_shuffle(spark, sf_smoke, tmp_path_factory):
    from big_data_tools_spark.io.sinks import write_bucketed
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.plans.lint import count_exchanges, explain_text

    o = load_table(spark, sf_smoke, "orders")
    c = load_table(spark, sf_smoke, "customer")
    write_bucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
                   "b_orders", ["o_custkey"], 4)
    write_bucketed(c.select("c_custkey", "c_name"), "b_customer", ["c_custkey"], 4)
    bo = spark.table("b_orders")
    bc = spark.table("b_customer")
    joined = bo.join(bc, bo.o_custkey == bc.c_custkey).filter("o_totalprice > 0")
    # co-located: sort-merge join with no shuffle exchange on either side
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert count_exchanges(joined) == 0, explain_text(joined)[:2000]
        assert joined.count() == o.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partition_pruning_reaches_scan(spark, sf_smoke, tmp_path_factory):
    from big_data_tools_spark.io.sinks import write_parquet
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.plans.lint import explain_text

    out = str(tmp_path_factory.mktemp("pruned") / "orders_by_status")
    o = load_table(spark, sf_smoke, "orders")
    write_parquet(o, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    plan = explain_text(back)
    assert "PartitionFilters" in plan
    # the partition predicate must NOT degrade to a post-scan filter
    assert back.count() == o.filter("o_orderstatus = 'F'").count()


def test_csv_roundtrip_with_explicit_schema(spark, sf_smoke, tmp_path_factory):
    from pyspark.sql import types as T

    from big_data_tools_spark.io.sources import load_table, read_csv

    out = str(tmp_path_factory.mktemp("csv") / "orders")
    o = load_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    o.write.mode("overwrite").option("header", "true").csv(out)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    back = read_csv(spark, out, schema=schema)
    assert back.schema == schema
    assert back.count() == o.count()
    a = o.agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)).first()[0]
    b = back.agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)).first()[0]
    assert a == b


def test_orc_roundtrip(spark, sf_smoke, tmp_path_factory):
    """ORC source/sink parity with parquet (engine addition: the other
    columnar format Spark ships natively)."""
    from big_data_tools_spark.io.sources import load_table

    out = str(tmp_path_factory.mktemp("orc") / "orders")
    o = load_table(spark, sf_smoke, "orders")
    o.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == o.schema
    assert back.count() == o.count()
    a = o.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).first()[0]
    b = back.agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))).first()[0]
    assert a == b


def test_compact_reduces_file_count(spark, sf_smoke, tmp_path_factory):
    from big_data_tools_spark.operators.partitioning import compact

    out = str(tmp_path_factory.mktemp("compacted"))
    o = load_table(spark, sf_smoke, "orders").repartition(64)  # small-file mess
    compacted = compact(o)  # tiny table -> a handful of partitions
    compacted.write.mode("overwrite").parquet(out)
    import os

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) <= 4, files
    assert spark.read.parquet(out).count() == o.count()


def test_compact_cluster_by_gives_disjoint_ranges(spark, sf_smoke, tmp_path_factory):
    """Range-clustered output files have non-overlapping key spans, so
    parquet min/max stats can skip whole files for key predicates."""
    from pyspark.sql import functions as F

    from big_data_tools_spark.operators.partitioning import compact

    o = load_table(spark, sf_smoke, "orders")
    clustered = compact(o, target_partition_bytes=8 * 1024, cluster_by=["o_custkey"])
    spans = (
        clustered.select(F.spark_partition_id().alias("pid"), "o_custkey")
        .groupBy("pid")
        .agg(F.min("o_custkey").alias("lo"), F.max("o_custkey").alias("hi"))
        .collect()
    )
    assert len(spans) > 1, "fixture should compact into multiple partitions"
    ordered = sorted(((r["lo"], r["hi"]) for r in spans))
    for (lo1, hi1), (lo2, hi2) in zip(ordered, ordered[1:]):
        assert hi1 <= lo2, f"overlapping ranges ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_zorder_files_narrow_on_both_dims(spark, sf_oracle, tmp_path):
    """Z-order clustering: every written file carries a narrow min/max
    span on BOTH interleaved columns, where a linear sort leaves the
    second column's span at ~100% (no skipping possible)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.zorder import with_zorder_key

    li = load_table(spark, sf_oracle, "lineitem").select("l_partkey", "l_suppkey")
    gspan = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("p"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("s"),
    ).first()

    def file_spans(path):
        spans = []
        for f in (p for p in __import__("pathlib").Path(path).rglob("*.parquet")):
            md = pq.read_metadata(str(f))
            mins = {c: None for c in ("l_partkey", "l_suppkey")}
            maxs = {c: None for c in ("l_partkey", "l_suppkey")}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in mins and col.statistics is not None:
                        st = col.statistics
                        mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                        maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
            spans.append(
                (
                    (maxs["l_partkey"] - mins["l_partkey"]) / gspan["p"],
                    (maxs["l_suppkey"] - mins["l_suppkey"]) / gspan["s"],
                )
            )
        return spans

    # z-order into 8 files
    zpath = str(tmp_path / "zordered")
    keyed = with_zorder_key(li, ["l_partkey", "l_suppkey"])
    (
        keyed.repartitionByRange(8, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(zpath)
    )
    zspans = file_spans(zpath)
    assert len(zspans) == 8

    # linear sort on partkey only, same file count
    lpath = str(tmp_path / "linear")
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    lspans = file_spans(lpath)

    zp = sum(s[0] for s in zspans) / len(zspans)
    zs = sum(s[1] for s in zspans) / len(zspans)
    lp = sum(s[0] for s in lspans) / len(lspans)
    ls = sum(s[1] for s in lspans) / len(lspans)
    # z-order: BOTH dims narrow (8 files ~ 2-3 curve splits per dim)
    assert zp < 0.7 and zs < 0.7, (zp, zs)
    # linear: first dim very narrow, second dim unskippable (~full span)
    assert lp < 0.3 and ls > 0.9, (lp, ls)
    # the multi-dim win: product of spans (2-D skip selectivity)
    assert zp * zs < 0.5 * (lp * ls + 1e-9) or zs < 0.7 < ls


def test_zorder_compact_preserves_rows(spark, sf_smoke, tmp_path):
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.zorder import zorder_compact

    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    out = zorder_compact(li, ["l_partkey", "l_suppkey"])
    assert out.columns == li.columns  # helper key dropped
    p = str(tmp_path / "zc")
    out.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    assert back.count() == li.count()
    a = {tuple(r) for r in back.collect()}
    b = {tuple(r) for r in li.collect()}
    assert a == b


def test_read_xml_native_source(spark, tmp_path):
    """Spark 4 native XML source through the engine's reader policy:
    inferred and explicit-schema reads agree."""
    from pyspark.sql import types as T

    from big_data_tools_spark.io.sources import read_xml

    p = str(tmp_path / "orders.xml")
    with open(p, "w") as f:
        f.write(
            "<orders>"
            "<order><id>1</id><status>O</status><total>100.5</total></order>"
            "<order><id>2</id><status>F</status><total>7.25</total></order>"
            "</orders>"
        )
    inferred = read_xml(spark, p, row_tag="order")
    assert inferred.count() == 2
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("status", T.StringType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    explicit = read_xml(spark, p, row_tag="order", schema=schema)
    rows = {tuple(r) for r in explicit.collect()}
    assert rows == {(1, "O", 100.5), (2, "F", 7.25)}


def test_parquet_layout_stats_counts_files_and_bytes(spark, sf_smoke, tmp_path_factory):
    from big_data_tools_spark.io.sinks import parquet_layout_stats

    out = str(tmp_path_factory.mktemp("layout"))
    load_table(spark, sf_smoke, "region").repartition(3).write.mode(
        "overwrite"
    ).parquet(out)
    n_files, total = parquet_layout_stats(spark, out)
    import os

    disk = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert n_files == len(disk)
    assert total == sum(os.path.getsize(os.path.join(out, f)) for f in disk)
    assert total > 0


def test_read_parquet_evolving_merges_added_column(spark, sf_smoke, tmp_path_factory):
    """Old files lacking the new column read it as NULL; the default
    single-footer read can drop the column entirely depending on which
    file gets sampled, so the merged schema is the contract."""
    from big_data_tools_spark.io.sinks import read_parquet_evolving

    base = str(tmp_path_factory.mktemp("evolve"))
    o = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_totalprice")
    o.write.parquet(f"{base}/batch=1")
    o.withColumn("channel", F.lit("web")).write.parquet(f"{base}/batch=2")

    merged = read_parquet_evolving(spark, base)
    assert set(merged.columns) >= {"o_orderkey", "o_totalprice", "channel"}
    n = o.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("channel").isNull()).count() == n
    assert merged.filter(F.col("channel") == "web").count() == n


def test_compact_table_cli(spark, sf_smoke, tmp_path):
    """tools/compact_table.py end to end: a 32-file mess compacts to
    few files with rows preserved and layout stats reported."""
    import json
    import subprocess
    import sys

    src = str(tmp_path / "mess")
    load_table(spark, sf_smoke, "orders").repartition(32).write.parquet(src)
    dest = str(tmp_path / "tidy")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "tools/compact_table.py", src, dest, "--target-mb", "64"],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["before"]["n_files"] == 32
    assert stats["after"]["n_files"] < 8
    assert stats["rows"] == spark.read.parquet(src).count()
