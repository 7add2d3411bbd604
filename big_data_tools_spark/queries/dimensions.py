"""Dimension-maintenance queries: SCD-2 history merge.

The reference joins point-in-time dimension snapshots into its
basetable (``Databricks Notebook.py:620-642``); production refreshes of
that pipeline need the type-2 merge implemented in
:mod:`big_data_tools_spark.operators.scd2`. The demonstration derives a
deterministic update batch from the orders table so the oracle can
replay the exact same merge in SQL: customers at or above the order
count threshold move to segment 'VIP', everyone else's update row is
attribute-identical — exercising both the changed (close + new
version) and the updated-but-unchanged (carried) merge paths on real
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.agg import sql_money_sum
from ..io.sources import load_table
from .registry import register

_SNAP_DATE = "2020-01-01"
_EFF_DATE = "2020-06-01"
_VIP_ORDERS = 15


def _scd2_history_ctes(snap_date: str, eff_date: str) -> str:
    """CTE chain building the customer SCD-2 history (snapshot +
    deterministic VIP update batch) ending in a ``history`` CTE —
    shared by the merge oracle and the point-in-time-join oracle so
    the two cannot drift. Parameterized dates: the merge demo pins its
    round-2 2020 dates; the PIT demo needs versions INSIDE the order
    date range."""
    return f"""
    dim AS (
        SELECT c_custkey, c_mktsegment, c_acctbal,
               DATE '{snap_date}' AS valid_from
        FROM customer
    ), upd AS (
        SELECT c.c_custkey,
               CASE WHEN count(o.o_orderkey) >= {_VIP_ORDERS}
                    THEN 'VIP' ELSE c.c_mktsegment END AS c_mktsegment,
               c.c_acctbal
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal
    ), changed AS (
        SELECT d.c_custkey
        FROM dim d JOIN upd u ON d.c_custkey = u.c_custkey
        WHERE d.c_mktsegment IS DISTINCT FROM u.c_mktsegment
           OR d.c_acctbal IS DISTINCT FROM u.c_acctbal
    ), history AS (
        SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal, d.valid_from,
               CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
        FROM dim d WHERE d.c_custkey NOT IN (SELECT c_custkey FROM changed)
        UNION ALL
        SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal, d.valid_from,
               DATE '{eff_date}' AS valid_to, FALSE AS is_current
        FROM dim d WHERE d.c_custkey IN (SELECT c_custkey FROM changed)
        UNION ALL
        SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
               DATE '{eff_date}' AS valid_from,
               CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
        FROM upd u WHERE u.c_custkey IN (SELECT c_custkey FROM changed)
    )
"""


@register(
    "customer_scd2_merge",
    sql=f"""
    WITH {_scd2_history_ctes(_SNAP_DATE, _EFF_DATE)}
    SELECT c_custkey, c_mktsegment, c_acctbal, valid_from,
           valid_to, is_current
    FROM history
    """,
    doc="SCD type-2 dimension merge (operators/scd2.py): customer "
    "snapshot vs a deterministic update batch (segment moves to 'VIP' "
    "at >=15 orders; other update rows are attribute-identical, so "
    "both the changed and carried merge paths fire on real rows). One "
    "full-outer shuffle on the business key, null-safe change "
    "detection, 0/1/2 output rows per key emitted via array+explode in "
    "one projection — no triple scan of the join. Grain invariant "
    "(<=1 current row per key) asserted in tests/test_operators.py.",
)
def customer_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _customer_history(spark, sf_dir, _SNAP_DATE, _EFF_DATE)


def _customer_history(
    spark: SparkSession, sf_dir: str, snap_date: str, eff_date: str
) -> DataFrame:
    """Spark twin of :func:`_scd2_history_ctes`: the customer SCD-2
    history (snapshot + VIP update batch) via ``scd2_apply``."""
    from ..operators.scd2 import scd2_apply

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit(snap_date).cast("date").alias("valid_from"),
    )
    upd = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment", "c_acctbal"),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .select(
            "c_custkey",
            F.when(F.col("n_orders") >= _VIP_ORDERS, F.lit("VIP"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
            "c_acctbal",
        )
    )
    return scd2_apply(
        dim,
        upd,
        key="c_custkey",
        attrs=("c_mktsegment", "c_acctbal"),
        eff_date=eff_date,
    )


@register(
    "user_current_state_cdc",
    sql="""
    WITH changes AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN event_type = 'signup' THEN 'I'
                    WHEN event_type = 'error'  THEN 'D'
                    ELSE 'U' END AS op
        FROM events
    ), latest AS (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM changes
    )
    SELECT user_id, ts AS last_ts, value AS last_value, op AS last_op
    FROM latest WHERE rn = 1 AND op <> 'D'
    """,
    doc="CDC apply-changes materialization (Delta APPLY CHANGES INTO "
    "shape, operators/cdc.py): the events feed tagged I/U/D (signup / "
    "activity / error) collapses to the current state per user — "
    "latest change by the event_id sequence wins, a trailing delete "
    "removes the user. ONE shuffle on the key; no join against a base "
    "table, no driver state. The incremental counterpart to the "
    "reference's rebuild-from-scratch refresh, composable with the "
    "SCD-2 merge when history must be kept.",
)
def user_current_state_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cdc import apply_changes, op_from_event_type

    events = load_table(spark, sf_dir, "events")
    changes = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        op_from_event_type(F.col("event_type")).alias("op"),
    )
    state = apply_changes(
        changes, keys=["user_id"], sequence_cols=["event_id"], op_col="op"
    )
    return state.select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("value").alias("last_value"),
        F.col("op").alias("last_op"),
    )


@register(
    "orders_snapshot_diff",
    sql="""
    WITH old_snap AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 89 <> 0
    ), new_snap AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 101 = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 97 <> 0
    ), j AS (
        SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'I'
                    WHEN n.o_orderkey IS NULL THEN 'D'
                    ELSE 'U' END AS change_type,
               CASE WHEN o.o_orderkey IS NULL OR n.o_orderkey IS NULL THEN ''
                    ELSE array_to_string(list_sort(list_filter([
                        CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                             THEN 'o_orderstatus' END,
                        CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                             THEN 'o_totalprice' END],
                        x -> x IS NOT NULL)), ',')
               END AS changed_cols,
               n.o_orderstatus, n.o_totalprice
        FROM old_snap o FULL OUTER JOIN new_snap n USING (o_orderkey)
    )
    SELECT * FROM j WHERE change_type <> 'U' OR changed_cols <> ''
    """,
    doc="Keyed snapshot diff (operators/tablediff.py): added / removed "
    "/ changed rows between two deterministic views of orders (one "
    "drops keys %89, the other drops %97 and recodes status on %101), "
    "with null-safe per-column change detection in the single "
    "full-outer shuffle. The 'what did this refresh do' audit the "
    "reference's blind overwrite-rebuild lacks; composes with "
    "cdc.apply_changes and scd2_apply.",
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.tablediff import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old_snap = orders.filter(F.col("o_orderkey") % 89 != 0)
    new_snap = orders.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 101 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    diff = snapshot_diff(
        old_snap,
        new_snap,
        keys=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice"],
    )
    return diff.select(
        "o_orderkey",
        "change_type",
        F.array_join(F.col("changed_cols"), ",").alias("changed_cols"),
        "o_orderstatus",
        "o_totalprice",
    )


_PIT_SNAP, _PIT_EFF = "1995-01-01", "1998-01-01"


@register(
    "orders_pit_segment_revenue",
    sql=f"""
    WITH {_scd2_history_ctes(_PIT_SNAP, _PIT_EFF)}
    , pit AS (
        SELECT h.c_mktsegment AS segment_at_order, o.o_totalprice
        FROM orders o
        JOIN history h ON h.c_custkey = o.o_custkey
        WHERE CAST(o.o_orderdate AS DATE) >= h.valid_from
          AND (h.valid_to IS NULL
               OR CAST(o.o_orderdate AS DATE) < h.valid_to)
    )
    SELECT segment_at_order,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_money_sum('o_totalprice')} AS revenue
    FROM pit GROUP BY segment_at_order
    """,
    doc="Point-in-time join (operators/pitjoin.py): revenue per the "
    "segment each customer was in WHEN the order was placed — the "
    "SCD-2 history (versions at 1995/1998, inside the order range) "
    "consumed correctly, vs the reference's join-to-today snapshot "
    "that rewrites history. Hash equi-join on the business key with "
    "the validity interval as a residual (versions per key are few; "
    "NOT a range join), then one rollup; orders shuffle once.",
)
def orders_pit_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.agg import money_sum
    from ..operators.pitjoin import point_in_time_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    history = _customer_history(spark, sf_dir, _PIT_SNAP, _PIT_EFF)
    pit = point_in_time_join(
        orders,
        history,
        fact_key="o_custkey",
        dim_key="c_custkey",
        ts=F.col("o_orderdate").cast("date"),
    )
    return (
        pit.select(F.col("c_mktsegment").alias("segment_at_order"), "o_totalprice")
        .groupBy("segment_at_order")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )
