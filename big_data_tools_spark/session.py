"""SparkSession factory with scale-sane defaults.

The reference sets no Spark configuration at all (verified full read of
``Databricks Notebook.py`` — no spark.conf, hints, repartition, cache).
We centralize configuration here so every test / bench / CLI entrypoint
gets the same AQE-enabled, Arrow-enabled session.

Design notes for 100 TB (tested on local[N]):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast-join conversion — these are the mechanisms that make
  the same declarative plan survive a 1000x scale-up.
- shuffle.partitions is only the *initial* number; AQE coalesces down.
  On a real cluster you'd size it ~2-3x total cores.
- Arrow enabled for any pandas interchange (Pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "big-data-tools-spark"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.maxResultSize", "2g")
        # local mode: one JVM hosts driver + all executor threads, so the
        # driver heap must be sized for N concurrent tasks (default 1g
        # OOMs under 32 parallel hash-agg tasks). Must be set before the
        # JVM launches; getOrCreate on an existing session ignores it.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
