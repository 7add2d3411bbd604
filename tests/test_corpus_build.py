"""Corpus-build CLI: the written artifact must agree with the
oracle-checked rollup query, and the shard layout must obey the
packing budget."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from big_data_tools_spark.pipeline.corpus_build import build_corpus
from big_data_tools_spark.queries import get


def test_build_corpus_matches_rollup_query(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "corpus")
    summary = build_corpus(spark, sf_smoke, out, budget=512, n_buckets=4)

    rollup = {
        r["source"]: (r["n_docs"], r["total_tokens"])
        for r in get("pretraining_corpus_pipeline").fn(spark, sf_smoke).collect()
    }
    assert set(summary["per_source"]) == set(rollup)
    for src, (n_docs, total_tokens) in rollup.items():
        assert summary["per_source"][src]["n_docs"] == n_docs
        assert summary["per_source"][src]["total_tokens"] == total_tokens

    docs = spark.read.parquet(f"{out}/documents")
    assert docs.count() == summary["n_docs"]
    assert docs.select("doc_id").distinct().count() == summary["n_docs"]

    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest == summary
    assert manifest["n_files"] >= 1 and manifest["total_bytes"] > 0


def test_build_corpus_shards_respect_budget(spark, sf_smoke, tmp_path):
    """Packing invariant on the WRITTEN artifact: every shard's token
    total stays under budget + the largest doc in it (a doc is never
    split, so one doc may overhang)."""
    out = str(tmp_path / "corpus2")
    build_corpus(spark, sf_smoke, out, budget=512, n_buckets=4)
    docs = spark.read.parquet(f"{out}/documents")
    per_shard = (
        docs.groupBy("bucket", "shard")
        .agg(F.sum("n_tok").alias("tot"), F.max("n_tok").alias("biggest"))
        .collect()
    )
    assert per_shard
    for r in per_shard:
        assert r["tot"] <= 512 + r["biggest"], dict(r.asDict())

    shards = spark.read.parquet(f"{out}/shards")
    written = {
        (r["bucket"], r["shard"]): (r["n_docs"], r["total_tokens"])
        for r in shards.collect()
    }
    from_docs = {
        (r["bucket"], r["shard"]): (r["n"], r["tot"])
        for r in docs.groupBy("bucket", "shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tot"))
        .collect()
    }
    assert written == from_docs


def test_cli_module_entrypoint(tmp_path):
    """The documented user entrypoint — python -m ...corpus_build —
    must parse args, run, and print the summary JSON line."""
    import subprocess
    import sys

    out = str(tmp_path / "cli_corpus")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "big_data_tools_spark.pipeline.corpus_build",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            out,
            "--budget",
            "512",
            "--buckets",
            "2",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["n_docs"] > 0 and summary["n_shards"] > 0
    assert os.path.exists(os.path.join(out, "manifest.json"))


def test_split_mode_is_leakage_safe_and_stable(spark, sf_smoke, tmp_path):
    """--split: every content fingerprint lands in exactly ONE split
    (duplicates can never straddle train/test), fractions are sane,
    and a rebuild with the same salt reproduces the assignment."""
    from big_data_tools_spark.pipeline.corpus_build import build_corpus

    out = str(tmp_path / "split_corpus")
    summary = build_corpus(spark, sf_smoke, out, budget=512, n_buckets=2, split=True)
    assert set(summary["per_split"]) <= {"train", "val", "test"}
    assert sum(summary["per_split"].values()) == summary["n_docs"]
    assert summary["per_split"]["train"] > summary["n_docs"] * 0.5

    docs = spark.read.parquet(f"{out}/documents")
    straddlers = (
        docs.groupBy("fp")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0

    out2 = str(tmp_path / "split_corpus2")
    build_corpus(spark, sf_smoke, out2, budget=512, n_buckets=2, split=True)
    a = {
        (r["doc_id"], r["split"])
        for r in docs.select("doc_id", "split").collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in spark.read.parquet(f"{out2}/documents")
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_mixture_tau_flattens_sources_deterministically(spark, sf_smoke, tmp_path):
    """--mixture-tau: per-source shares flatten toward uniform
    (coefficient of variation strictly drops), no source grows, and
    the deterministic hash makes rebuilds identical."""
    import statistics

    from big_data_tools_spark.pipeline.corpus_build import build_corpus

    base = build_corpus(spark, sf_smoke, str(tmp_path / "nat"), budget=512, n_buckets=2)
    mixed = build_corpus(
        spark, sf_smoke, str(tmp_path / "mix"), budget=512, n_buckets=2,
        mixture_tau=8.0,
    )
    assert mixed["mixture_tau"] == 8.0
    nat = {s: v["n_docs"] for s, v in base["per_source"].items()}
    mix = {s: v["n_docs"] for s, v in mixed["per_source"].items()}
    assert set(mix) <= set(nat)
    assert all(mix[s] <= nat[s] for s in mix)

    def cv(counts):
        vals = list(counts.values())
        return statistics.pstdev(vals) / statistics.mean(vals)

    # fill sources the mixture dropped entirely (if any) with 0
    mix_full = {s: mix.get(s, 0) for s in nat}
    assert cv(mix_full) < cv(nat) or cv(nat) < 0.02  # already near-uniform

    again = build_corpus(
        spark, sf_smoke, str(tmp_path / "mix2"), budget=512, n_buckets=2,
        mixture_tau=8.0,
    )
    assert again["per_source"] == mixed["per_source"]


def test_run_query_cli(tmp_path):
    """tools/run_query.py: --list shows the registry and a query runs
    through the real entrypoint."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    listing = subprocess.run(
        [sys.executable, "tools/run_query.py", "--list"],
        capture_output=True, text=True, timeout=120, cwd=repo,
    )
    assert listing.returncode == 0
    assert " * pricing_summary" in listing.stdout
    run = subprocess.run(
        [
            sys.executable, "tools/run_query.py", "pricing_summary",
            "--sf-dir", "/root/testdata/sf0.001",
        ],
        capture_output=True, text=True, timeout=300, cwd=repo,
    )
    assert run.returncode == 0, run.stderr[-2000:]
    assert "rows total" in run.stdout
