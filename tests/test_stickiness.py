"""events_stickiness vs an exact DuckDB replication — the local-oracle
pattern for SQL-expressible ops added after the twin-window capacity
ceiling (ROUND4_NOTES r5 pre-plan)."""

from __future__ import annotations

import duckdb

from big_data_tools_spark.queries import get


def test_stickiness_matches_duckdb(spark, sf_oracle):
    got = [
        (str(r["month"]), r["mau"], r["avg_dau"], r["stickiness"])
        for r in get("events_stickiness").fn(spark, sf_oracle).collect()
    ]
    want = [
        (str(m), mau, avg_dau, st)
        for m, mau, avg_dau, st in duckdb.sql(
            f"""
            WITH mdu AS (
                SELECT DISTINCT date_trunc('month', CAST(ts AS DATE)) AS month,
                       CAST(ts AS DATE) AS day, user_id
                FROM '{sf_oracle}/events.parquet'
            ), daily AS (
                SELECT month, round(avg(dau), 4) AS avg_dau FROM (
                    SELECT month, day, count(DISTINCT user_id) AS dau
                    FROM mdu GROUP BY 1, 2
                ) GROUP BY month
            ), monthly AS (
                SELECT month, count(DISTINCT user_id) AS mau FROM mdu GROUP BY 1
            )
            SELECT monthly.month, CAST(mau AS BIGINT), avg_dau,
                   round(avg_dau / mau, 6) AS stickiness
            FROM monthly JOIN daily USING (month) ORDER BY month
            """
        ).fetchall()
    ]
    assert got == want
    assert len(got) > 0
    assert all(0 < s <= 1 for *_, s in got)
