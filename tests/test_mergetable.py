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
    # simulate a writer that died after staging data files but before
    # claiming the manifest: orphaned staging data must be invisible
    import big_data_tools_spark.io.mergetable as mt

    orig = mt._try_claim
    mt._try_claim = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash"))
    try:
        with pytest.raises(RuntimeError):
            merge_upsert(spark, root, _df(spark, [(1, "X", 0)]))
    finally:
        mt._try_claim = orig
    assert read_manifest(root)["version"] == 1
    assert _snap(spark, root) == {1: ("a", 10)}
    # replaying the batch after the crash converges
    merge_upsert(spark, root, _df(spark, [(1, "X", 0)]), batch_id="b1")
    assert _snap(spark, root) == {1: ("X", 0)}


def _inject_competing_commit(spark, root, rows):
    """Arm the test injection hook so the NEXT claim attempt is
    preceded by a competing committed merge (deterministic race)."""
    import big_data_tools_spark.io.mergetable as mt

    def hook():
        mt._on_before_claim = None  # disarm before recursing
        merge_upsert(spark, root, _df(spark, rows), batch_id="intruder")

    mt._on_before_claim = hook


def test_occ_disjoint_merge_rebases_without_recompute(spark, root):
    """A writer that loses the version race to a BUCKET-DISJOINT commit
    rebases its already-staged files onto the winner and commits —
    both updates land, no data recompute."""
    import big_data_tools_spark.io.mergetable as mt

    rows = [(i, f"r{i}", i) for i in range(1, 33)]
    create_table(spark, root, _df(spark, rows), ["k"], n_buckets=16)
    # pick two keys that hash to different buckets
    b = {r.k: r.b for r in
         _df(spark, rows).select("k", mt._bucket_col(["k"], 16).alias("b")).collect()}
    k_mine = 1
    k_other = next(k for k in b if b[k] != b[k_mine])
    stages = 0
    orig_write = mt._write_bucket_files

    def counting_write(*a, **kw):
        nonlocal stages
        stages += 1
        return orig_write(*a, **kw)

    mt._write_bucket_files = counting_write
    try:
        _inject_competing_commit(spark, root, [(k_other, "OTHER", 0)])
        m = merge_upsert(spark, root, _df(spark, [(k_mine, "MINE", 0)]))
    finally:
        mt._write_bucket_files = orig_write
        mt._on_before_claim = None
    assert m["version"] == 3 and m["parent_version"] == 2
    # one stage for us, one for the intruder — the rebase re-staged nothing
    assert stages == 2
    snap = _snap(spark, root)
    assert snap[k_mine] == ("MINE", 0) and snap[k_other] == ("OTHER", 0)


def test_occ_overlapping_merge_recomputes(spark, root):
    """A writer racing a commit that touched the SAME bucket must
    recompute from the new snapshot — last logical writer wins."""
    import big_data_tools_spark.io.mergetable as mt

    create_table(spark, root, _df(spark, [(1, "a", 10)]), ["k"], n_buckets=4)
    _inject_competing_commit(spark, root, [(1, "THEIRS", 1)])
    try:
        m = merge_upsert(spark, root, _df(spark, [(1, "OURS", 2)]))
    finally:
        mt._on_before_claim = None
    assert m["version"] == 3
    assert _snap(spark, root)[1] == ("OURS", 2)


def test_occ_replay_applied_by_other_writer_is_noop(spark, root):
    """Idempotence across writers: if the commit we raced against
    already applied OUR batch_id, we return its manifest unchanged."""
    import big_data_tools_spark.io.mergetable as mt

    create_table(spark, root, _df(spark, [(1, "a", 10)]), ["k"], n_buckets=4)

    def hook():
        mt._on_before_claim = None
        merge_upsert(spark, root, _df(spark, [(1, "WINNER", 1)]), batch_id="B7")

    mt._on_before_claim = hook
    try:
        m = merge_upsert(
            spark, root, _df(spark, [(1, "LOSER", 2)]), batch_id="B7"
        )
    finally:
        mt._on_before_claim = None
    assert m["version"] == 2  # the winner's commit, not a new one
    assert _snap(spark, root)[1] == ("WINNER", 1)


def test_occ_retry_exhaustion_raises(spark, root):
    import big_data_tools_spark.io.mergetable as mt

    create_table(spark, root, _df(spark, [(1, "a", 10)]), ["k"], n_buckets=4)

    def always_racing():  # every attempt loses to a fresh conflicting commit
        merge_upsert_orig = merge_upsert
        mt._on_before_claim = None
        merge_upsert_orig(spark, root, _df(spark, [(1, "x", 0)]))
        mt._on_before_claim = always_racing

    mt._on_before_claim = always_racing
    try:
        with pytest.raises(ConcurrentWriterError):
            merge_upsert(
                spark, root, _df(spark, [(1, "y", 1)]), max_retries=2
            )
    finally:
        mt._on_before_claim = None


def test_occ_real_threads_disjoint(spark, root):
    """Two genuinely concurrent writers on disjoint key ranges both
    commit (smoke for the deterministic-hook tests above)."""
    import threading

    rows = [(i, f"r{i}", i) for i in range(1, 65)]
    create_table(spark, root, _df(spark, rows), ["k"], n_buckets=16)
    errs = []

    def work(lo, hi, tag):
        try:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", tag)
            merge_upsert(
                spark, root, _df(spark, [(i, tag, 0) for i in range(lo, hi)])
            )
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    t1 = threading.Thread(target=work, args=(1, 9, "T1"))
    t2 = threading.Thread(target=work, args=(33, 41, "T2"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    snap = _snap(spark, root)
    assert all(snap[i] == ("T1", 0) for i in range(1, 9))
    assert all(snap[i] == ("T2", 0) for i in range(33, 41))
    assert read_manifest(root)["version"] == 3


def test_optimize_compact_and_history(spark, root):
    from big_data_tools_spark.io.mergetable import optimize_compact, table_history

    rows = [(i, f"r{i}", i) for i in range(1, 129)]
    # repartition(8) fragments every bucket dir into multiple part files
    create_table(
        spark, root, _df(spark, rows).repartition(8), ["k"], n_buckets=4
    )
    before = _snap(spark, root)
    m = optimize_compact(spark, root, min_files_per_bucket=2)
    assert m["version"] == 2 and m["operation"] == "optimize"
    # every bucket now holds exactly one parquet part
    for rel in m["files"].values():
        parts = [f for f in os.listdir(os.path.join(root, rel))
                 if f.endswith(".parquet")]
        assert len(parts) == 1
    assert _snap(spark, root) == before  # no logical change
    # a second pass finds nothing fragmented and commits nothing
    assert optimize_compact(spark, root, min_files_per_bucket=2)["version"] == 2
    merge_upsert(spark, root, _df(spark, [(1, "A", 0)]), batch_id="h1")
    hist = table_history(root)
    assert [h["version"] for h in hist] == [3, 2, 1]
    assert [h["operation"] for h in hist] == ["merge", "optimize", "create"]
    assert hist[0]["batch_id"] == "h1" and hist[2]["batch_id"] is None


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
