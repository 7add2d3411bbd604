"""Markov removal-effect attribution (Anderl et al. 2016, "Mapping
the customer journey") — the data-driven attribution model: build the
first-order Markov chain over user journeys truncated at first
conversion, compute the absorbing-chain conversion probability by a
fixed-k quantized power iteration, and credit each channel by its
REMOVAL EFFECT (how much conversion probability disappears when the
channel's inbound traffic is redirected to null).

Scale stance: journeys reduce to the |states|^2 transition grain in
one fact shuffle (the event_transition_matrix shape); the chain math
— base + one removal variant per channel — folds over the BOUNDED
edge array inside single rows (the Holt/Kaplan-Meier fold recipe),
with probability mass in integer micro-units so every product stays
an exact integer in a double and the DuckDB twin (iteration CTEs
unrolled per removal variant) is bit-identical with no terminal
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io.sources import load_table
from .registry import register

_MK_ITERS = 16  # fixed power-iteration depth, shared with the oracle
_CONV = "purchase"  # the converting event type


def _markov_sql() -> str:
    """Unrolled-iteration DuckDB twin: mass table at (variant, state)
    grain per iteration, conversion mass accumulated separately."""
    its = []
    for k in range(1, _MK_ITERS + 1):
        prev = f"it{k - 1}"
        its.append(
            f"""it{k} AS (
        SELECT m.ch, e.dst AS state,
               CAST(sum(CAST(round(m.mass_u * e.p_u / 1000000.0) AS BIGINT))
                    AS BIGINT) AS mass_u
        FROM {prev} m
        JOIN edges e ON e.src = m.state AND e.src != m.ch AND e.dst != m.ch
        WHERE e.dst NOT IN ('(conv)', '(null)')
        GROUP BY 1, 2
    ), cv{k} AS (
        SELECT c.ch,
               c.conv_u + coalesce((
                   SELECT CAST(sum(CAST(round(m.mass_u * e.p_u / 1000000.0)
                                        AS BIGINT)) AS BIGINT)
                   FROM {prev} m
                   JOIN edges e ON e.src = m.state AND e.src != m.ch
                   WHERE e.dst = '(conv)' AND m.ch = c.ch
               ), 0) AS conv_u
        FROM cv{k - 1} c
    )"""
        )
    unrolled = ",\n    ".join(its)
    return f"""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = '{_CONV}' THEN '(conv)'
                    ELSE event_type END AS state,
               min(CASE WHEN event_type = '{_CONV}' THEN ts END)
                   OVER (PARTITION BY user_id) AS conv_ts
        FROM events
    ), cut AS (
        SELECT user_id, ts, event_id, state,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_ev
        FROM seq WHERE conv_ts IS NULL OR ts <= conv_ts
    ), trans_raw AS (
        SELECT user_id,
               coalesce(lag(state) OVER (PARTITION BY user_id
                                         ORDER BY rn), '(start)') AS src,
               state AS dst
        FROM cut
        UNION ALL
        SELECT user_id, state AS src, '(null)' AS dst
        FROM cut WHERE rn = n_ev AND state != '(conv)'
    ), counts AS (
        SELECT src, dst, CAST(count(*) AS BIGINT) AS n
        FROM trans_raw GROUP BY src, dst
    ), edges AS (
        SELECT src, dst,
               CAST(round(n * 1000000.0
                          / sum(n) OVER (PARTITION BY src)) AS BIGINT) AS p_u
        FROM counts
    ), channels AS (
        SELECT DISTINCT src AS ch FROM edges WHERE src != '(start)'
    ), variants AS (
        SELECT '(base)' AS ch UNION ALL SELECT ch FROM channels
    ), it0 AS (
        SELECT ch, '(start)' AS state, CAST(1000000 AS BIGINT) AS mass_u
        FROM variants
    ), cv0 AS (
        SELECT ch, CAST(0 AS BIGINT) AS conv_u FROM variants
    ),
    {unrolled},
    base AS (
        SELECT conv_u AS base_u FROM cv{_MK_ITERS} WHERE ch = '(base)'
    ), removed AS (
        SELECT ch AS channel, conv_u AS removed_u
        FROM cv{_MK_ITERS} WHERE ch != '(base)'
    ), re AS (
        SELECT channel, removed_u, base_u,
               greatest(base_u - removed_u, 0) AS re_u
        FROM removed, base
    )
    SELECT channel,
           base_u / 1000000.0 AS p_conv_base,
           removed_u / 1000000.0 AS p_conv_removed,
           re_u * 1.0 / base_u AS removal_effect,
           re_u * 1.0 / (SELECT sum(re_u) FROM re) AS attribution_share
    FROM re
    """


@register(
    "purchase_markov_attribution",
    sql=_markov_sql(),
    doc="Markov removal-effect attribution over user journeys: "
    "journeys truncate at first purchase (mapped to the absorbing "
    "(conv) state; journeys without one terminate in (null)); "
    "first-order transition probabilities quantize to integer "
    "micro-units; the absorbing-chain conversion probability comes "
    f"from a fixed {_MK_ITERS}-step power iteration (identical, "
    "quantized, in both engines — per-edge flows round to integer "
    "micro-units each step so products stay exact in doubles); each "
    "channel's credit is its removal effect (conversion probability "
    "lost when edges touching the channel are cut), normalized to "
    "attribution shares. Completes the attribution family next to "
    "last-click (purchase_last_click_asof) and time-decay "
    "(purchase_decay_attribution) with the standard data-driven "
    "model. Scale shape: one fact shuffle to the |states|^2 "
    "transition grain; base + per-channel variants fold over the "
    "bounded edge array inside one row each — chain math costs "
    "nothing beyond the bigram rollup at any scale.",
)
def purchase_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    state = F.when(F.col("event_type") == _CONV, "(conv)").otherwise(
        F.col("event_type")
    )
    seq = events.select(
        "user_id",
        "ts",
        "event_id",
        state.alias("state"),
        F.min(F.when(F.col("event_type") == _CONV, F.col("ts"))).over(wu).alias(
            "conv_ts"
        ),
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cut = seq.filter(
        F.col("conv_ts").isNull() | (F.col("ts") <= F.col("conv_ts"))
    ).select(
        "user_id",
        "state",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wu).alias("n_ev"),
        F.lag("state").over(wo).alias("prev"),
    )
    trans = cut.select(
        F.coalesce(F.col("prev"), F.lit("(start)")).alias("src"),
        F.col("state").alias("dst"),
    ).unionByName(
        cut.filter((F.col("rn") == F.col("n_ev")) & (F.col("state") != "(conv)"))
        .select(F.col("state").alias("src"), F.lit("(null)").alias("dst"))
    )
    counts = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    edges = counts.select(
        "src",
        "dst",
        F.round(
            F.col("n") * F.lit(1_000_000.0)
            / F.sum("n").over(Window.partitionBy("src"))
        )
        .cast("bigint")
        .alias("p_u"),
    )
    # bounded: |states|^2 edges and |channels|+1 variants fold in rows
    packed = edges.agg(
        F.collect_list(F.struct("src", "dst", "p_u")).alias("edges"),
        F.array_sort(
            F.array_distinct(
                F.collect_list(
                    F.when(F.col("src") != "(start)", F.col("src"))
                )
            )
        ).alias("channels"),
    )
    variants = packed.select(
        "edges",
        F.explode(
            F.concat(F.array(F.lit("(base)")), F.col("channels"))
        ).alias("ch"),
        F.col("channels"),
    )

    # states that can hold mass: (start) + channels
    states = F.concat(F.array(F.lit("(start)")), F.col("channels"))
    init = F.struct(
        F.transform(
            states,
            lambda s: F.struct(
                s.alias("state"),
                F.when(s == "(start)", F.lit(1_000_000).cast("long"))
                .otherwise(F.lit(0).cast("long"))
                .alias("mass_u"),
            ),
        ).alias("mass"),
        F.lit(0).cast("long").alias("conv_u"),
    )

    def _mass_of(acc, src):
        hit = F.filter(acc["mass"], lambda m: m["state"] == src)
        return F.coalesce(F.element_at(hit, 1)["mass_u"], F.lit(0).cast("long"))

    def _flow(acc, e):
        return F.round(_mass_of(acc, e["src"]) * e["p_u"] / F.lit(1_000_000.0)).cast(
            "long"
        )

    def _step(acc, _):
        ch = F.col("ch")
        live = F.filter(
            F.col("edges"), lambda e: (e["src"] != ch) & (e["dst"] != ch)
        )
        new_mass = F.transform(
            states,
            lambda s: F.struct(
                s.alias("state"),
                F.aggregate(
                    F.filter(live, lambda e: e["dst"] == s),
                    F.lit(0).cast("long"),
                    lambda a, e: a + _flow(acc, e),
                ).alias("mass_u"),
            ),
        )
        conv_gain = F.aggregate(
            F.filter(live, lambda e: e["dst"] == F.lit("(conv)")),
            F.lit(0).cast("long"),
            lambda a, e: a + _flow(acc, e),
        )
        return F.struct(
            new_mass.alias("mass"), (acc["conv_u"] + conv_gain).alias("conv_u")
        )

    folded = variants.select(
        "ch",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(_MK_ITERS)), init, _step
        )["conv_u"].alias("conv_u"),
    )
    base = folded.filter(F.col("ch") == "(base)").select(
        F.col("conv_u").alias("base_u")
    )
    rem = folded.filter(F.col("ch") != "(base)").crossJoin(F.broadcast(base))
    re = rem.select(
        F.col("ch").alias("channel"),
        "base_u",
        F.col("conv_u").alias("removed_u"),
        F.greatest(F.col("base_u") - F.col("conv_u"), F.lit(0).cast("long")).alias(
            "re_u"
        ),
    )
    tot = F.sum("re_u").over(Window.partitionBy())
    return re.select(
        "channel",
        (F.col("base_u") / F.lit(1_000_000.0)).alias("p_conv_base"),
        (F.col("removed_u") / F.lit(1_000_000.0)).alias("p_conv_removed"),
        (F.col("re_u") / F.col("base_u")).alias("removal_effect"),
        (F.col("re_u") / tot).alias("attribution_share"),
    )
