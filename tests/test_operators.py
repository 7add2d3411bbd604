"""Unit + property tests for core operators (SURVEY.md §5.2.1/5.2.3),
including the reference's dirty-data edge cases.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from big_data_tools_spark.operators.cleaning import dedup_keep_min, null_audit, recode_bulk
from big_data_tools_spark.operators.hours import hours_availability
from big_data_tools_spark.operators.maps import parse_dict_literal, parse_dict_literal_json
from big_data_tools_spark.operators.scalar import with_global_max
from big_data_tools_spark.operators.star import GrainError, assert_unique_key


# --------------------------------------------------------------------- hours
@pytest.mark.parametrize(
    "s,avail",
    [
        ("9:0-21:0", 12),
        ("22:0-2:0", 4),     # past midnight (+24 rule, reference :505-507)
        ("18:0-18:0", 24),   # close == open -> wraps a full day (:502 '<=')
        ("0:0-23:30", 23),   # hour part only (substring_index ':' semantics)
        (None, None),
    ],
)
def test_hours_availability_cases(spark, s, avail):
    df = spark.createDataFrame([(s,)], "h string")
    got = df.select(hours_availability(F.col("h")).alias("a")).first()["a"]
    assert got == avail


# ---------------------------------------------------------------------- maps
def test_parse_dict_literal_keeps_leading_space_artifact(spark):
    df = spark.createDataFrame([("{'romantic': True, 'casual': False}",)], "m string")
    rows = df.select(F.explode(parse_dict_literal(F.col("m"))).alias("k", "v")).collect()
    kv = {r["k"]: r["v"] for r in rows}
    # reference semantics: values keep the leading space from ', ' split (:336)
    assert kv["romantic"] == " True"
    assert kv[" casual"] == " False"


def test_parse_dict_literal_json_normalizes(spark):
    df = spark.createDataFrame(
        [("{'a': True, 'b': False, 'c': None}",)], "m string"
    )
    m = df.select(parse_dict_literal_json(F.col("m")).alias("m")).first()["m"]
    assert m == {"a": "true", "b": "false", "c": None}


# ------------------------------------------------------------------- cleaning
def test_recode_bulk_single_pass(spark):
    df = spark.createDataFrame([("True", "False"), (None, "True")], "a string, b string")
    out = recode_bulk(df, ["a", "b"], {"True": "1", "False": "0"}, default="Missing")
    rows = out.collect()
    assert (rows[0]["a"], rows[0]["b"]) == ("1", "0")
    assert (rows[1]["a"], rows[1]["b"]) == ("Missing", "1")


def test_null_audit_counts_nan_and_null(spark):
    df = spark.createDataFrame(
        [(1.0, "x"), (float("nan"), None), (None, "y")], "d double, s string"
    )
    row = null_audit(df).first()
    assert row["d"] == 2  # one NaN + one null
    assert row["s"] == 1


def test_assert_unique_key_raises_on_dups(spark):
    ok = spark.createDataFrame([(1,), (2,)], "k int")
    assert_unique_key(ok, ["k"])  # no raise
    dup = spark.createDataFrame([(1,), (1,)], "k int")
    with pytest.raises(GrainError):
        assert_unique_key(dup, ["k"])


# ------------------------------------------------------------ property tests
@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_keep_min_properties(spark, rows):
    df = spark.createDataFrame(rows, "k int, ord int, payload int")
    out = dedup_keep_min(df, ["k"], "ord")
    got = out.collect()
    keys = [r["k"] for r in got]
    # one row per key
    assert sorted(keys) == sorted(set(r[0] for r in rows))
    # kept row has the minimal ord per key
    mins = {}
    for k, o, _ in rows:
        mins[k] = min(mins.get(k, o), o)
    for r in got:
        assert r["ord"] == mins[r["k"]]
    # idempotence
    again = dedup_keep_min(out, ["k"], "ord").collect()
    assert sorted((r["k"], r["ord"]) for r in again) == sorted(
        (r["k"], r["ord"]) for r in got
    )


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=50))
def test_with_global_max_matches_python_max(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "x int")
    out = with_global_max(df, F.col("x"), "mx").collect()
    assert len(out) == len(xs)
    assert all(r["mx"] == max(xs) for r in out)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=40,
    )
)
def test_pivot_dummies_preserves_ids_and_is_binary(spark, rows):
    from big_data_tools_spark.operators.maps import pivot_dummies

    df = spark.createDataFrame(rows, "id int, k string")
    out = pivot_dummies(df, "id", "k", values=["a", "b", "c"])
    got = out.collect()
    # exactly one output row per distinct input id (row preservation)
    assert sorted(r["id"] for r in got) == sorted({i for i, _ in rows})
    # every dummy cell is 0/1, and 1 iff the (id, key) pair existed
    seen = {(i, k) for i, k in rows}
    for r in got:
        for k in ("a", "b", "c"):
            assert r[k] in (0, 1)
            assert (r[k] == 1) == ((r["id"], k) in seen)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(-100, 100)),
        min_size=1,
        max_size=30,
    )
)
def test_fillna_with_computed_max_leaves_no_nulls(spark, xs):
    from pyspark.sql import functions as F

    from big_data_tools_spark.operators.scalar import with_global_max

    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "id int, v int")
    out = with_global_max(df, F.col("v"), "mx").select(
        "id", F.coalesce("v", "mx").alias("v")
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    non_null = [x for x in xs if x is not None]
    assert len(got) == len(xs)  # row preservation
    if not non_null:
        # nothing to compute a max from: nulls stay (documented)
        assert all(v is None for v in got.values())
    else:
        mx = max(non_null)
        assert all(v is not None for v in got.values())  # completeness
        for i, x in enumerate(xs):
            assert got[i] == (x if x is not None else mx)


def test_range_join_matches_naive(spark):
    from datetime import datetime

    from big_data_tools_spark.operators.rangejoin import range_join

    def t(s):
        return datetime.fromisoformat(s)

    left = spark.createDataFrame(
        [
            (1, "u1", t("2024-01-01 10:00:00")),
            (2, "u1", t("2024-01-01 12:00:00")),
            (3, "u2", t("2024-01-01 10:30:00")),
            (4, "u3", t("2024-01-01 09:00:00")),
        ],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", t("2024-01-01 09:10:00"), 1.0),
            ("u1", t("2024-01-01 09:59:59"), 2.0),
            ("u1", t("2024-01-01 10:00:00"), 3.0),  # boundary: inclusive
            ("u1", t("2024-01-01 11:30:00"), 4.0),
            ("u2", t("2024-01-01 10:30:00"), 5.0),
            ("u2", t("2024-01-01 08:00:00"), 6.0),
        ],
        "k string, rts timestamp, v double",
    )
    got = range_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        lo_sec=-3600, hi_sec=0,
    )
    naive = left.join(right, on="k").filter(
        (F.col("rts").cast("long") >= F.col("ts").cast("long") - 3600)
        & (F.col("rts").cast("long") <= F.col("ts").cast("long"))
    )
    key = lambda r: (r["id"], r["v"])
    assert sorted(map(key, got.collect())) == sorted(map(key, naive.collect()))
    # id=1 window [09:00, 10:00] inclusive: 09:10, 09:59:59, 10:00 boundary
    assert sorted(v["v"] for v in got.filter("id = 1").collect()) == [1.0, 2.0, 3.0]

    left_j = range_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        lo_sec=-3600, hi_sec=0, how="left",
    )
    # u3 has no right rows at all but must survive with nulls
    rows = left_j.filter("id = 4").collect()
    assert len(rows) == 1 and rows[0]["v"] is None
    assert left_j.filter("v IS NOT NULL").count() == naive.count()


def test_range_join_rejects_bad_args(spark):
    from big_data_tools_spark.operators.rangejoin import range_join

    df = spark.range(1).selectExpr("cast(id as string) k", "current_timestamp() ts")
    with pytest.raises(ValueError):
        range_join(df, df, on=["k"], left_ts="ts", right_ts="ts", lo_sec=5, hi_sec=1)
    with pytest.raises(ValueError):
        range_join(
            df, df, on=["k"], left_ts="ts", right_ts="ts",
            lo_sec=0, hi_sec=1, how="full",
        )


def test_scrub_pii_redacts_all_kinds(spark):
    from big_data_tools_spark.operators.text import PII_PATTERNS, scrub_pii

    from pyspark.sql import functions as F

    text = (
        "mail alice.smith+x@corp.example.org from 192.168.1.254, "
        "card 4111 1111 1111 1111 or 4111-1111-1111-1111, "
        "ssn 078-05-1120, call 415-555-0100 or 415 555 0100."
    )
    df = spark.createDataFrame([(text,)], ["t"])
    out = df.select(scrub_pii(F.col("t")).alias("s")).first()["s"]
    for token in ("<EMAIL>", "<IP>", "<CC>", "<SSN>", "<PHONE>"):
        assert token in out, f"{token} missing in: {out}"
    # nothing matching any pattern may survive the scrub
    checks = df.select(
        *[F.regexp_count(F.lit(out), F.lit(p)).alias(n) for n, p, _ in PII_PATTERNS]
    ).first()
    assert all(v == 0 for v in checks.asDict().values()), out


def test_hash_topk_per_group_exact_k_and_layout_independent(spark, sf_oracle):
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.sampling import hash_topk_per_group

    d = load_table(spark, sf_oracle, "documents").select("doc_id", "lang")
    out = hash_topk_per_group(d, ["lang"], "doc_id", k=10)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(10, sizes[lang])
    # layout independence: a different partitioning picks the same rows
    repart = hash_topk_per_group(d.repartition(17), ["lang"], "doc_id", k=10)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in repart.collect()}
    # independent draw under a different salt
    other = hash_topk_per_group(d, ["lang"], "doc_id", k=10, salt="s1")
    assert {r["doc_id"] for r in out.collect()} != {r["doc_id"] for r in other.collect()}


def test_pack_token_shards_budget_property(spark, sf_oracle):
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.packing import pack_token_shards, shard_manifest

    d = load_table(spark, sf_oracle, "documents")
    packed = pack_token_shards(d, "text", "doc_id", budget=500, n_buckets=4)
    # every doc assigned exactly once
    assert packed.count() == d.count()
    man = shard_manifest(packed).collect()
    max_tok = packed.agg(F.max("n_tok")).first()[0]
    last_shard = {}
    for r in man:
        last_shard[r["bucket"]] = max(last_shard.get(r["bucket"], -1), r["shard"])
    for r in man:
        # docs are never split, so a boundary-straddling doc moves a
        # non-final shard off the budget by at most its own length
        if r["shard"] != last_shard[r["bucket"]]:
            assert 500 - max_tok < r["total_tokens"] <= 500 + max_tok, r
    # deterministic under relayout
    repacked = pack_token_shards(d.repartition(13), "text", "doc_id", budget=500, n_buckets=4)
    assert {tuple(r) for r in packed.collect()} == {tuple(r) for r in repacked.collect()}


def test_ngram_contamination_detects_planted_overlap(spark):
    from big_data_tools_spark.operators.contamination import ngram_contamination

    phrase = "alpha beta gamma delta epsilon zeta"  # 6 tokens -> two 5-grams
    train = spark.createDataFrame(
        [
            (1, f"lead in {phrase} tail words here"),
            (2, "totally unrelated content with many different words"),
        ],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame([(100, f"prefix {phrase} suffix")], ["doc_id", "text"])
    out = {r["train_id"]: r for r in ngram_contamination(train, test, n=5).collect()}
    assert set(out) == {1}
    assert out[1]["n_test_docs"] == 1 and out[1]["max_shared"] == 2


def test_ngram_contamination_df_cap_drops_boilerplate(spark):
    from big_data_tools_spark.operators.contamination import ngram_contamination

    boiler = "one two three four five"
    train = spark.createDataFrame(
        [(i, boiler) for i in range(1, 5)], ["doc_id", "text"]
    )
    test = spark.createDataFrame([(100, boiler)], ["doc_id", "text"])
    # the only shared 5-gram appears in 4 train docs; cap at 3 kills it
    assert ngram_contamination(train, test, n=5, max_doc_freq=3).count() == 0
    assert ngram_contamination(train, test, n=5, max_doc_freq=None).count() == 4


def test_repetition_ratio_expression(spark):
    from big_data_tools_spark.operators.text import repetition_ratio

    rows = [
        (1, "a b c a b c a b c"),   # 7 3-grams, 3 distinct -> 4/7
        (2, "w x y z"),             # 2 distinct 3-grams -> 0.0
        (3, "too short"),           # < 3 tokens -> 0.0
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {r["i"]: r["rep"] for r in df.select("i", repetition_ratio(F.col("t")).alias("rep")).collect()}
    assert abs(got[1] - 4 / 7) < 1e-12
    assert got[2] == 0.0 and got[3] == 0.0


def test_mixture_rebalance_plan_properties(spark, sf_oracle):
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.sampling import mixture_rebalance_plan

    d = load_table(spark, sf_oracle, "documents")
    targets = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    plan = {r["source"]: r for r in mixture_rebalance_plan(d, "source", targets).collect()}
    # no upsampling, zero for untargeted strata
    for s, r in plan.items():
        assert 0.0 <= r["keep_frac"] <= 1.0
        if s not in targets:
            assert r["keep_frac"] == 0.0
    # at least one stratum is the binding constraint (kept fully)
    assert any(abs(plan[s]["keep_frac"] - 1.0) < 1e-9 for s in targets)
    # realized mixture matches the target shares
    total = sum(plan[s]["n_rows"] * plan[s]["keep_frac"] for s in targets)
    for s, t in targets.items():
        share = plan[s]["n_rows"] * plan[s]["keep_frac"] / total
        assert abs(share - t) < 1e-9, (s, share, t)


# ---------------------------------------------------------------------- scd2
def test_scd2_apply_three_paths_and_grain(spark):
    from big_data_tools_spark.operators.scd2 import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "A", 10.0, "2020-01-01"),  # changed attr
            (2, "B", 20.0, "2020-01-01"),  # update row identical -> carried
            (3, None, 30.0, "2020-01-01"),  # NULL -> value change (null-safe)
            (4, "D", 40.0, "2020-01-01"),  # absent from updates -> carried
        ],
        "k int, seg string, bal double, valid_from string",
    ).withColumn("valid_from", F.col("valid_from").cast("date"))
    upd = spark.createDataFrame(
        [
            (1, "A2", 10.0),
            (2, "B", 20.0),
            (3, "C", 30.0),
            (5, "E", 50.0),  # brand-new key -> inserted
        ],
        "k int, seg string, bal double",
    )
    out = scd2_apply(dim, upd, key="k", attrs=("seg", "bal"), eff_date="2020-06-01")
    rows = {(r.k, r.seg, r.is_current): r for r in out.collect()}

    # changed keys: closed old version + new current version
    for k, old_seg, new_seg in [(1, "A", "A2"), (3, None, "C")]:
        closed, new = rows[(k, old_seg, False)], rows[(k, new_seg, True)]
        assert str(closed.valid_to) == "2020-06-01" and str(new.valid_from) == "2020-06-01"
        assert new.valid_to is None
    # carried keys: single open row, original valid_from
    for k, seg in [(2, "B"), (4, "D")]:
        r = rows[(k, seg, True)]
        assert str(r.valid_from) == "2020-01-01" and r.valid_to is None
    # inserted key
    r = rows[(5, "E", True)]
    assert str(r.valid_from) == "2020-06-01" and r.valid_to is None

    # keys 1,3 emit 2 rows each (closed + new); 2,4,5 emit 1 -> 7 rows
    assert out.count() == 7
    # grain invariant: at most one current row per key
    cur = out.filter("is_current").groupBy("k").count().filter("count > 1")
    assert cur.count() == 0


def test_scd2_apply_idempotent(spark):
    """Re-applying the same update batch to the merged dimension's
    current rows closes nothing — merge is idempotent."""
    from big_data_tools_spark.operators.scd2 import scd2_apply

    dim = spark.createDataFrame(
        [(1, "A", "2020-01-01"), (2, "B", "2020-01-01")],
        "k int, seg string, valid_from string",
    ).withColumn("valid_from", F.col("valid_from").cast("date"))
    upd = spark.createDataFrame([(1, "A2"), (3, "C")], "k int, seg string")

    once = scd2_apply(dim, upd, key="k", attrs=("seg",), eff_date="2020-06-01")
    current = once.filter("is_current").select("k", "seg", "valid_from")
    twice = scd2_apply(current, upd, key="k", attrs=("seg",), eff_date="2020-07-01")

    assert twice.filter("NOT is_current").count() == 0  # nothing closes
    a = {tuple(r) for r in current.collect()}
    b = {tuple(r) for r in twice.select("k", "seg", "valid_from").collect()}
    assert a == b


# -------------------------------------------------------------------- observe
def test_with_audit_matches_direct_aggregation(spark, sf_oracle):
    """Observed metrics equal a direct aggregation over the same frame
    (and cost zero extra scans — they ride the action's accumulators)."""
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.observe import with_audit

    # forked session: observe must not initialize the shared session's
    # ObservationManager (see operators/observe.py Spark 4.1.2 caveat)
    obs_spark = spark.newSession()
    orders = load_table(obs_spark, sf_oracle, "orders")
    observed, obs = with_audit(orders, null_cols=("o_custkey",))
    n = observed.count()
    got = obs.get
    assert got["n_rows"] == n
    direct = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("nulls"),
    ).first()
    assert got["n_rows"] == direct["n"]
    assert got["null_o_custkey"] == direct["nulls"]


def test_ml_eval_healthy_after_observed_query(spark, sf_smoke):
    """Regression: running the observed-audit query must not poison
    later ML model evaluation on the caller's session (Spark 4.1.2's
    lazily-initialized ObservationManager is not serializable)."""
    from big_data_tools_spark.queries import get

    get("observed_rollup_audit").fn(spark, sf_smoke).count()
    # model.transform + evaluator serialize a summary-bearing model;
    # this throws NotSerializableException if the session was poisoned
    metrics = {r.metric: r.value for r in get("ml_train_eval").fn(spark, sf_smoke).collect()}
    assert "test_auc" in metrics


# --------------------------------------------------------------- expectations
def test_check_constraints_single_pass(spark, sf_smoke):
    from big_data_tools_spark.io.sources import load_table
    from big_data_tools_spark.operators.expectations import (
        ConstraintViolation,
        check_constraints,
    )

    orders = load_table(spark, sf_smoke, "orders")
    ok = check_constraints(
        orders,
        {
            "custkey_present": F.col("o_custkey").isNotNull(),
            "price_positive": F.col("o_totalprice") > 0,
            "status_domain": F.col("o_orderstatus").isin("O", "F", "P"),
        },
    )
    assert set(ok.values()) == {0}

    with pytest.raises(ConstraintViolation) as exc:
        check_constraints(
            orders,
            {
                "price_positive": F.col("o_totalprice") > 0,
                "impossible": F.col("o_totalprice") > 1e12,
            },
        )
    # only the failed check reported, with its violation count
    assert "impossible" in str(exc.value)
    assert "price_positive" not in exc.value.counts
    assert exc.value.counts["impossible"] == orders.count()


def test_check_constraints_null_is_violation(spark):
    from big_data_tools_spark.operators.expectations import (
        ConstraintViolation,
        check_constraints,
    )

    df = spark.createDataFrame([(1,), (None,)], "v int")
    with pytest.raises(ConstraintViolation) as exc:
        check_constraints(df, {"v_gt0": F.col("v") > 0})
    assert exc.value.counts["v_gt0"] == 1  # NULL > 0 is unknown -> violation


def test_constraint_report_never_raises(spark):
    """The non-raising form returns violation counts as rows even on
    dirty data (ADVICE r2: a driver row must survive violations)."""
    from big_data_tools_spark.operators.expectations import constraint_report

    df = spark.createDataFrame([(1,), (None,), (-3,)], "v int")
    rows = {
        r.check_name: r.violations
        for r in constraint_report(
            df, {"v_present": F.col("v").isNotNull(), "v_gt0": F.col("v") > 0}
        ).collect()
    }
    assert rows == {"v_present": 1, "v_gt0": 2}
    assert constraint_report(df, {}).count() == 0


def test_check_names_reserved_prefix_rejected(spark):
    """ADVICE r2: a check literally named __total collided with the
    internal total-count alias; reserved names now fail loudly."""
    from big_data_tools_spark.operators.expectations import (
        check_constraints,
        constraint_report,
    )

    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="__"):
        check_constraints(df, {"__total": F.col("v") > 0})
    with pytest.raises(ValueError, match="__"):
        constraint_report(df, {"__shadow": F.col("v") > 0})
