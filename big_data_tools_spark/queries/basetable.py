"""The reference's end-to-end basetable as a HARD-signal query
(r2 VERDICT ask #8).

``yelp_basetable`` runs the full pipeline on in-memory fixtures, so the
driver could only count rows. ``yelp_basetable_mini`` runs the SAME
pipeline stages (pipeline/yelp.py: review/checkin/tip/user rollups,
enum recodes, dict-literal dummies, wraparound hours, covid label,
star join, max-fill + zero-fill null repair) over the committed parquet
copies of those fixtures (fixtures/yelp/, written by
tools/write_yelp_fixtures.py) and pairs it with a DuckDB twin over the
IDENTICAL files — every stage of the reference's Databricks
Notebook.py:129-691 pipeline is hash-compared, not just row-counted.

"Mini" refers to the projection, not the pipeline: the driver-facing
output keeps one representative column per pipeline stage (label,
recoded enums, a dummy from each map block, wraparound weekly hours,
each rollup metric, both null-repair forms) instead of all 52 columns,
keeping the twin reviewable while exercising everything.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register

_FIXDIR = Path(__file__).resolve().parents[2] / "fixtures" / "yelp"

_TABLES = ("business", "review", "checkin", "tip", "user", "covid")


def _avail_sql(day: str) -> str:
    """Wraparound open-hours span for one weekday (matches
    operators/hours.py: close <= open means past-midnight, +24)."""
    # TRY_CAST: a NULL weekday reaches split_part as NULL/'' — map both
    # to NULL exactly like Spark's cast-of-null, then coalesce to 0
    o = f"TRY_CAST(split_part(split_part(hours.\"{day}\", '-', 1), ':', 1) AS INT)"
    c = f"TRY_CAST(split_part(split_part(hours.\"{day}\", '-', 2), ':', 1) AS INT)"
    return f"coalesce(CASE WHEN {c} <= {o} THEN {c} + 24 - {o} ELSE {c} - {o} END, 0)"


_WEEKLY_HOURS_SQL = " + ".join(
    _avail_sql(d)
    for d in ("Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday", "Sunday")
)

# Mirrors pipeline/yelp.py stage by stage over the same parquet bytes.
# Numbered to the reference notebook lines the Spark side cites.
_MINI_SQL = f"""
WITH review_src AS (
    SELECT business_ID, review_id, user_id, useful, stars,
           date_diff('day',
                     CAST(strptime(date, '%Y-%m-%d %H:%M:%S') AS DATE),
                     DATE '2020-03-01') AS recency
    FROM read_parquet('{_FIXDIR}/review.parquet')
), review_scored AS (
    SELECT *,
           1 - recency / max(recency) OVER () AS discount_factor
    FROM review_src
), review_metrics AS (
    SELECT business_ID AS business_id,
           CAST(sum(useful) AS BIGINT) AS useful_sum,
           CAST(count(review_id) AS BIGINT) AS n_reviews,
           avg(stars * discount_factor) AS avg_adjusted_rating,
           CAST(count(CASE WHEN stars > 3 THEN 1 END) AS BIGINT)
               AS positive_reviews,
           CAST(count(CASE WHEN stars < 4 THEN 1 END) AS BIGINT)
               AS negative_reviews
    FROM review_scored GROUP BY business_ID
), checkin_metrics AS (
    SELECT business_ID AS business_id,
           CAST(count(*) AS BIGINT) AS checkin_count,
           CAST(min(recency) AS INT) AS min_checkin_recency,
           CAST(max(recency) AS INT) AS max_checkin_recency
    FROM (
        SELECT business_ID,
               date_diff('day',
                         CAST(strptime(ltrim(date), '%Y-%m-%d %H:%M:%S')
                              AS DATE),
                         DATE '2020-03-01') AS recency
        FROM read_parquet('{_FIXDIR}/checkin.parquet')
    ) GROUP BY business_ID
), tip_metrics AS (
    SELECT business_id, CAST(count(*) AS BIGINT) AS tip_count
    FROM read_parquet('{_FIXDIR}/tip.parquet') GROUP BY business_id
), user_fans AS (
    SELECT business_id, avg(fans_sum) AS avg_reviewer_fans
    FROM (
        SELECT r.business_ID AS business_id, r.user_id,
               sum(u.fans) AS fans_sum
        FROM read_parquet('{_FIXDIR}/review.parquet') r
        JOIN read_parquet('{_FIXDIR}/user.parquet') u USING (user_id)
        GROUP BY r.business_ID, r.user_id
    ) GROUP BY business_id
), business_clean AS (
    SELECT business_id,
           CASE attributes."WiFi"
                WHEN '''free''' THEN 'free' WHEN 'u''free''' THEN 'free'
                WHEN '''paid''' THEN 'paid' WHEN 'u''paid''' THEN 'paid'
                WHEN '''no'''   THEN 'no'   WHEN 'u''no'''   THEN 'no'
                ELSE 'Missing' END AS wifi,
           CASE attributes."Alcohol"
                WHEN '''beer_and_wine''' THEN 'beer_and_wine'
                WHEN 'u''beer_and_wine''' THEN 'beer_and_wine'
                WHEN '''full_bar''' THEN 'full_bar'
                WHEN 'u''full_bar''' THEN 'full_bar'
                WHEN '''none''' THEN 'none' WHEN 'u''none''' THEN 'none'
                ELSE 'Missing' END AS alcohol,
           CASE WHEN attributes."Ambience" LIKE '%''romantic'': True%'
                THEN 1 ELSE 0 END AS ambience_romantic,
           CASE WHEN attributes."BusinessParking" LIKE '%''garage'': True%'
                THEN 1 ELSE 0 END AS parking_garage,
           {_WEEKLY_HOURS_SQL} AS weekly_hours_open
    FROM read_parquet('{_FIXDIR}/business.parquet')
    WHERE categories LIKE '%Restaurants%' OR categories LIKE '%Food%'
       OR categories LIKE '%Cafes%' OR categories LIKE '%Bars%'
), covid_labels AS (
    SELECT business_id,
           CASE WHEN upper("delivery or takeout") = 'TRUE'
                THEN 1 ELSE 0 END AS label
    FROM (SELECT DISTINCT * FROM read_parquet('{_FIXDIR}/covid.parquet'))
), joined AS (
    SELECT cv.business_id, cv.label,
           b.wifi, b.alcohol, b.ambience_romantic, b.parking_garage,
           b.weekly_hours_open,
           uf.avg_reviewer_fans,
           tm.tip_count,
           rm.useful_sum, rm.n_reviews, rm.avg_adjusted_rating,
           rm.positive_reviews, rm.negative_reviews,
           cm.checkin_count, cm.min_checkin_recency, cm.max_checkin_recency
    FROM covid_labels cv
    JOIN business_clean b USING (business_id)
    JOIN user_fans uf USING (business_id)
    LEFT JOIN tip_metrics tm USING (business_id)
    LEFT JOIN review_metrics rm USING (business_id)
    LEFT JOIN checkin_metrics cm USING (business_id)
), repaired AS (
    SELECT *,
           coalesce(min_checkin_recency,
                    max(max_checkin_recency) OVER ()) AS min_rec_fill,
           coalesce(max_checkin_recency,
                    max(max_checkin_recency) OVER ()) AS max_rec_fill
    FROM joined
)
SELECT business_id,
       CAST(label AS INT) AS label,
       wifi, alcohol,
       CAST(ambience_romantic AS INT) AS ambience_romantic,
       CAST(parking_garage AS INT) AS parking_garage,
       CAST(weekly_hours_open AS INT) AS weekly_hours_open,
       CAST(coalesce(useful_sum, 0) AS BIGINT) AS useful_sum,
       CAST(coalesce(n_reviews, 0) AS BIGINT) AS n_reviews,
       round(coalesce(avg_adjusted_rating, 0), 3) AS avg_adjusted_rating,
       CAST(coalesce(positive_reviews, 0) AS BIGINT) AS positive_reviews,
       CAST(coalesce(negative_reviews, 0) AS BIGINT) AS negative_reviews,
       CAST(coalesce(tip_count, 0) AS BIGINT) AS tip_count,
       CAST(coalesce(checkin_count, 0) AS BIGINT) AS checkin_count,
       CAST(coalesce(min_rec_fill, 0) AS INT) AS min_checkin_recency,
       CAST(coalesce(max_rec_fill, 0) AS INT) AS max_checkin_recency,
       round(coalesce(avg_reviewer_fans, 0), 3) AS avg_reviewer_fans
FROM repaired
"""


@register(
    "yelp_basetable_mini",
    sql=_MINI_SQL,
    doc="The reference pipeline (Databricks Notebook.py:129-691) as a "
    "HARD-signal query: the full build_basetable star-join +"
    " null-repair over committed parquet fixture tables, projected to "
    "one representative column per pipeline stage and hash-compared "
    "against a DuckDB twin over the identical files. Replaces "
    "yelp_basetable's rows-only check (r2 VERDICT ask #8); ignores "
    "sf_dir by design (fixture-driven, like the in-memory form).",
)
def yelp_basetable_mini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipeline.yelp import build_basetable

    t = {n: spark.read.parquet(str(_FIXDIR / f"{n}.parquet")) for n in _TABLES}
    bt = build_basetable(
        t["business"], t["review"], t["checkin"], t["tip"], t["user"], t["covid"]
    )
    return bt.select(
        "business_id",
        F.col("label").cast("int").alias("label"),
        F.col("attributes_WiFi").alias("wifi"),
        F.col("attributes_Alcohol").alias("alcohol"),
        F.col("Ambience_romantic").cast("int").alias("ambience_romantic"),
        F.col("BusinessParking_garage").cast("int").alias("parking_garage"),
        F.col("weekly_hours_open").cast("int").alias("weekly_hours_open"),
        F.col("useful_sum").cast("long").alias("useful_sum"),
        F.col("n_reviews").cast("long").alias("n_reviews"),
        F.round("avg_adjusted_rating", 3).alias("avg_adjusted_rating"),
        F.col("positive_reviews").cast("long").alias("positive_reviews"),
        F.col("negative_reviews").cast("long").alias("negative_reviews"),
        F.col("tip_count").cast("long").alias("tip_count"),
        F.col("checkin_count").cast("long").alias("checkin_count"),
        F.col("min_checkin_recency").cast("int").alias("min_checkin_recency"),
        F.col("max_checkin_recency").cast("int").alias("max_checkin_recency"),
        F.round("avg_reviewer_fans", 3).alias("avg_reviewer_fans"),
    )
