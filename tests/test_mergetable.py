"""Transactional merge-table (io/mergetable.py) contract tests:
atomic commit, snapshot isolation, idempotent batch replay, bounded
copy-on-write IO, deletes, vacuum retention."""

from __future__ import annotations

import os
import shutil

import pytest

from big_data_tools_spark.io.mergetable import (
    ConcurrentWriterError,
    create_table,
    merge_upsert,
    read_manifest,
    read_table,
    vacuum,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string, amt bigint")


def _snap(spark, root, version=None):
    return {
        r.k: (r.v, r.amt)
        for r in read_table(spark, root, version).collect()
    }


def test_create_merge_read_roundtrip(spark, root):
    create_table(spark, root, _df(spark, [(1, "a", 10), (2, "b", 20)]), ["k"])
    assert _snap(spark, root) == {1: ("a", 10), 2: ("b", 20)}
    # update key 2, insert key 3
    merge_upsert(spark, root, _df(spark, [(2, "B", 25), (3, "c", 30)]))
    assert _snap(spark, root) == {1: ("a", 10), 2: ("B", 25), 3: ("c", 30)}


def test_idempotent_batch_replay(spark, root):
    create_table(spark, root, _df(spark, [(1, "a", 10)]), ["k"])
    up = _df(spark, [(1, "a", 11), (2, "b", 20)])
    m1 = merge_upsert(spark, root, up, batch_id=7)
    m2 = merge_upsert(spark, root, up, batch_id=7)  # replayed delivery
    assert m2["version"] == m1["version"]  # no new commit
    assert _snap(spark, root) == {1: ("a", 11), 2: ("b", 20)}


def test_snapshot_isolation(spark, root):
    create_table(spark, root, _df(spark, [(1, "a", 10), (2, "b", 20)]), ["k"])
    v1 = read_manifest(root)["version"]
    pinned = _snap(spark, root, v1)
    merge_upsert(spark, root, _df(spark, [(1, "A", 99)]))
    # pinned reader still sees the old snapshot; latest sees the merge
    assert _snap(spark, root, v1) == pinned == {1: ("a", 10), 2: ("b", 20)}
    assert _snap(spark, root)[1] == ("A", 99)


def test_untouched_buckets_not_rewritten(spark, root):
    rows = [(i, f"r{i}", i) for i in range(1, 65)]
    create_table(spark, root, _df(spark, rows), ["k"], n_buckets=16)
    before = read_manifest(root)["files"]
    merge_upsert(spark, root, _df(spark, [(1, "R1", 100)]))
    after = read_manifest(root)["files"]
    same = [b for b in before if before[b] == after.get(b)]
    # exactly the buckets NOT containing key 1 keep their old files
    assert len(same) >= len(before) - 1
    assert len(same) < len(before)  # key 1's bucket did rewrite
    assert _snap(spark, root)[1] == ("R1", 100)
    assert _snap(spark, root)[64] == ("r64", 64)


def test_deletes_via_tombstone(spark, root):
    create_table(spark, root, _df(spark, [(1, "a", 10), (2, "b", 20)]), ["k"])
    up = spark.createDataFrame(
        [(2, "b", 20, True), (3, "c", 30, False)],
        "k bigint, v string, amt bigint, __deleted boolean",
    )
    merge_upsert(spark, root, up)
    assert _snap(spark, root) == {1: ("a", 10), 3: ("c", 30)}


def test_crash_before_commit_leaves_old_version(spark, root):
    create_table(spark, root, _df(spark, [(1, "a", 10)]), ["k"])
    # simulate a writer that died after writing data files but before
    # the pointer swap: orphaned staging data must be invisible
    import big_data_tools_spark.io.mergetable as mt

    orig = mt._commit
    mt._commit = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash"))
    try:
        with pytest.raises(RuntimeError):
            merge_upsert(spark, root, _df(spark, [(1, "X", 0)]))
    finally:
        mt._commit = orig
    assert read_manifest(root)["version"] == 1
    assert _snap(spark, root) == {1: ("a", 10)}
    # replaying the batch after the crash converges
    merge_upsert(spark, root, _df(spark, [(1, "X", 0)]), batch_id="b1")
    assert _snap(spark, root) == {1: ("X", 0)}


def test_single_writer_lock(spark, root):
    create_table(spark, root, _df(spark, [(1, "a", 10)]), ["k"])
    lock = os.path.join(root, "_write.lock")
    open(lock, "w").write("999999")
    with pytest.raises(ConcurrentWriterError):
        merge_upsert(spark, root, _df(spark, [(2, "b", 2)]))
    os.remove(lock)
    merge_upsert(spark, root, _df(spark, [(2, "b", 2)]))
    assert 2 in _snap(spark, root)


def test_vacuum_retention(spark, root):
    create_table(spark, root, _df(spark, [(1, "a", 10)]), ["k"], n_buckets=2)
    for i in range(4):
        merge_upsert(spark, root, _df(spark, [(1, "a", 10 + i)]))
    latest = read_manifest(root)["version"]
    removed = vacuum(root, keep_last=2)
    assert removed  # old versions' files went away
    # the kept snapshots still read
    assert _snap(spark, root, latest)[1] == ("a", 13)
    assert _snap(spark, root, latest - 1)[1] == ("a", 12)
    # a vacuumed-away snapshot is gone (retention contract)
    with pytest.raises(Exception):
        _snap(spark, root, 1)


def test_streaming_merge_upsert_matches_batch(spark, sf_smoke):
    """End-to-end: the transactional streaming sink's final snapshot
    equals the batch aggregation, and the manifest history shows one
    atomic commit per micro-batch."""
    import tempfile

    from pyspark.sql import functions as F

    from big_data_tools_spark.io.mergetable import read_table
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.streaming.events import read_events_stream
    from big_data_tools_spark.streaming.upsert import merge_upsert_sink

    root = tempfile.mkdtemp(prefix="bdt_merge_stream_t_") + "/tbl"
    stream = read_events_stream(spark, sf_smoke, path_glob="events.parquet")
    q = merge_upsert_sink(
        stream, root, query_name="bdt_merge_stream_t", checkpoint_ns="t"
    )
    q.awaitTermination()
    got = {
        r.event_type: (r.n, r.value_sum)
        for r in read_table(spark, root).collect()
    }
    batch = load_table(spark, sf_smoke, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("value_sum"),
    )
    want = {r.event_type: (r.n, r.value_sum) for r in batch.collect()}
    assert got == want
    assert read_manifest(root)["version"] >= 1
