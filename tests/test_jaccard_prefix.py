"""Prefix-filtered exact Jaccard join (AllPairs/PPJoin candidate
scheme): output must equal the brute-force pair set exactly — the
prefix filter is a pruning, never a semantics change. Pins the
integer-exact ceil at the float-boundary thresholds where IEEE
arithmetic would overshoot, and the completeness lemma on pairs that
share ONLY rare tokens (caught only if prefixes are long enough)."""

from __future__ import annotations

import itertools
import random

from big_data_tools_spark.operators.dedup import jaccard_prefix_pairs


def _brute(docs: dict[int, str], n: int, t: float) -> set[tuple[int, int, float]]:
    def sh(text):
        toks = [w for w in text.lower().split(" ") if w != ""]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: sh(x) for i, x in docs.items() if len(sh(x)) > 0}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = inter / len(sets[a] | sets[b])
        if j >= t:
            out.add((a, b, round(j, 6)))
    return out


def _run(spark, docs: dict[int, str], t: float) -> set[tuple[int, int, float]]:
    df = spark.createDataFrame(
        [(i, x) for i, x in docs.items()], "doc_id long, text string"
    )
    rows = jaccard_prefix_pairs(df, "text", "doc_id", n=3, threshold=t).collect()
    return {(r.id_a, r.id_b, round(r.jaccard, 6)) for r in rows}


def test_exact_boundary_threshold(spark):
    """Pairs sitting EXACTLY on the threshold must be kept (>=), and
    the prefix arithmetic must not lose them: at t=0.8 with |x|=5
    shingles, IEEE ceil(0.8*5) = ceil(4.0000000000000002) = 5 would
    shorten x's prefix to one token — the integer-exact ceil keeps it
    at two. y subset-of-x with 4 shingles gives J = 4/5 exactly."""
    docs = {
        1: "a b c d e f g",  # 5 shingles
        2: "a b c d e f",  # 4 shingles, all shared -> J = 4/5 = 0.8
        3: "a b c d e f g",  # exact dup of 1 -> J = 1.0
    }
    got = _run(spark, docs, 0.8)
    assert got == {(1, 2, 0.8), (1, 3, 1.0), (2, 3, 0.8)}
    # J = 3/4 boundary at t = 0.75 (exactly representable): x with 4
    # shingles, y its 3-shingle prefix subset
    docs = {1: "a b c d e f", 2: "a b c d e"}
    assert _run(spark, docs, 0.75) == {(1, 2, 0.75)}
    # just above the boundary the pair must vanish
    assert _run(spark, docs, 0.750001) == set()
    # t = 1.0: only exact duplicates survive
    docs = {1: "a b c d", 2: "a b c d", 3: "a b c e"}
    assert _run(spark, docs, 1.0) == {(1, 2, 1.0)}


def test_rare_token_only_overlap(spark):
    """Pairs whose common shingles are the RAREST in the corpus land
    in both prefixes by construction — while hot boilerplate shingles
    shared with everyone must not create threshold-passing pairs."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = {i: f"{boiler} filler{i} filler{i}b" for i in range(1, 7)}
    docs[10] = "zz yy xx ww vv uu tt ss"
    docs[11] = "zz yy xx ww vv uu tt rr"  # shares 5 of its 6 shingles with 10
    got = _run(spark, docs, 0.7)
    want = _brute(docs, 3, 0.7)
    assert got == want
    assert (10, 11, round(5 / 7, 6)) in got


def test_randomized_equals_brute_force(spark):
    """Random small corpus: the operator must reproduce the Python
    brute force bit-for-bit (after round-6) at several thresholds."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 18)))
        for i in range(40)
    }
    # plant a few near-dups so the >= t set is non-trivial
    docs[100] = docs[0] + " extra"
    docs[101] = docs[1]
    for t in (0.5, 0.75, 1.0):
        assert _run(spark, docs, t) == _brute(docs, 3, t), f"t={t}"


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    for bad in (0.0, -0.1, 1.5):
        try:
            jaccard_prefix_pairs(df, "text", "doc_id", threshold=bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
