"""Holt linear-trend forecast: the distributed fold must match a
pure-Python replication of the same recurrence on the same series."""

from __future__ import annotations

import duckdb

from big_data_tools_spark.queries import get
from big_data_tools_spark.queries.analytics import (
    _HOLT_ALPHA,
    _HOLT_BETA,
    _HOLT_HORIZON,
)


def _python_holt(series):
    # mirrors the per-step 6-decimal quantization the query applies so
    # its recursive-CTE oracle can replay the fold bit-for-bit
    ys = [y for _, y in series]
    l, b = ys[0], round(ys[1] - ys[0], 6)
    for y in ys[1:]:
        nl = round(_HOLT_ALPHA * y + (1 - _HOLT_ALPHA) * (l + b), 6)
        nb = round(_HOLT_BETA * (nl - l) + (1 - _HOLT_BETA) * b, 6)
        l, b = nl, nb
    return l, b


def test_forecast_matches_python_replication(spark, sf_smoke):
    con = duckdb.connect()
    series = con.sql(
        f"""
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                    AS DOUBLE) AS y
        FROM '{sf_smoke}/orders.parquet'
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    l, b = _python_holt(series)
    rows = sorted(
        get("monthly_revenue_forecast").fn(spark, sf_smoke).collect(),
        key=lambda r: r["month"],
    )
    assert len(rows) == _HOLT_HORIZON
    last_month = series[-1][0]
    for h, r in enumerate(rows, start=1):
        assert (r["month"].year, r["month"].month) == (
            (last_month.year + (last_month.month + h - 1) // 12),
            (last_month.month + h - 1) % 12 + 1,
        )
        assert abs(r["forecast"] - round(l + h * b, 2)) < 1e-6, (h, r)
