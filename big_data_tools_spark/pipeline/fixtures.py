"""Deterministic Yelp-shaped fixtures (FIXTURES.md Family B).

Small literal tables that reproduce every dirty-data quirk the
reference's operators exist to handle: quote-variant enums, dict-
literal map strings, leading-space checkin dates, single-digit month
review dates, past-midnight hours, duplicate covid rows, all-null
attribute rows, and businesses missing from fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from big_data_tools_spark.io.schemas import YELP_SCHEMAS


def _attrs(alcohol=None, ambience=None, bike=None, parking=None, wifi=None):
    return (
        alcohol,  # Alcohol
        ambience,  # Ambience
        bike,  # BikeParking
        None,  # BusinessAcceptsBitcoin
        "True",  # BusinessAcceptsCreditCards
        parking,  # BusinessParking
        None,  # Caters
        None,  # DietaryRestrictions
        "False",  # DriveThru
        None,  # GoodForMeal
        None,  # Open24Hours
        "True",  # OutdoorSeating
        None,  # RestaurantsDelivery
        "2",  # RestaurantsPriceRange2
        "True",  # RestaurantsTakeOut
        wifi,  # WiFi
    )


def _hours(mon=None, tue=None):
    return (mon, tue, None, None, None, None, None)


def yelp_tables(spark: SparkSession) -> dict[str, DataFrame]:
    business = spark.createDataFrame(
        [
            # b1: full quirks — dict-literal maps, wraparound Tuesday hours
            ("b1", "Cafe One", "Coffee, Restaurants",
             _attrs(alcohol="'full_bar'",
                    ambience="{'romantic': True, 'casual': False}",
                    bike="True",
                    parking="{'garage': True, 'street': False}",
                    wifi="u'free'"),
             _hours(mon="9:0-21:0", tue="22:0-2:0"), "Springfield", "IL", 1, 10, 4.5),
            # b2: second enum variants
            ("b2", "Diner Two", "Food, Breakfast",
             _attrs(ambience="{'romantic': False, 'casual': True}",
                    bike="False", wifi="'paid'"),
             _hours(mon="8:0-16:0"), "Springfield", "IL", 1, 5, 3.0),
            # b3: all-null attributes row (null-audit path)
            ("b3", "Cafe Three", "Cafes",
             (None,) * 16, _hours(), "Shelbyville", "IN", 0, 2, 2.5),
            # b4: no checkins/tips (left-join null repair path)
            ("b4", "Bar Four", "Bars, Nightlife",
             _attrs(alcohol="u'beer_and_wine'", wifi="u'no'"),
             _hours(mon="18:0-18:0"), "Capital City", "IL", 1, 8, 4.0),
            # b5: NOT food industry -> dropped by the categories filter
            ("b5", "Garage Five", "Automotive, Repair",
             (None,) * 16, _hours(), "Springfield", "IL", 1, 1, 3.5),
            # b6: food but no covid row -> dropped by inner join
            ("b6", "Grill Six", "Restaurants",
             (None,) * 16, _hours(), "Springfield", "IL", 1, 3, 3.5),
            # b7: covid row but no reviews -> dropped by user-metrics inner join
            ("b7", "Stand Seven", "Food",
             (None,) * 16, _hours(), "Shelbyville", "IN", 1, 0, 3.0),
            # b8: plain negative-label business
            ("b8", "Cafe Eight", "Cafes",
             _attrs(wifi="'free'"), _hours(mon="7:0-15:0"),
             "Capital City", "IL", 1, 4, 3.5),
        ],
        YELP_SCHEMAS["business"],
    )

    review = spark.createDataFrame(
        [
            # single-digit month AND day (pattern 'yyyy-M-d H:mm:ss', :129)
            ("r1", "u1", "b1", 5.0, 2, "2020-2-1 10:00:00", "great coffee"),
            ("r2", "u2", "b1", 2.0, 1, "2019-12-15 9:30:00", "meh"),
            ("r3", "u1", "b2", 4.0, 0, "2020-1-5 8:00:00", "solid diner"),
            ("r4", "u3", "b3", 3.0, 3, "2019-6-1 12:00:00", "ok"),
            ("r5", "u2", "b4", 4.5, 1, "2020-2-20 22:10:00", "good bar"),
            ("r6", "u1", "b8", 1.0, 0, "2018-3-3 7:45:00", "bad"),
            ("r7", "u3", "b6", 5.0, 0, "2020-1-1 1:00:00", "no label though"),
        ],
        YELP_SCHEMAS["review"],
    )

    checkin = spark.createDataFrame(
        [
            # leading space + two-digit day (pattern ' yyyy-M-dd H:mm:ss', :172-175)
            ("b1", " 2020-1-15 12:00:00"),
            ("b1", " 2019-11-20 18:30:00"),
            ("b2", " 2020-2-28 09:00:00"),
            ("b3", " 2018-5-10 10:00:00"),
            ("b8", " 2019-12-31 23:00:00"),
        ],
        YELP_SCHEMAS["checkin"],
    )

    tip = spark.createDataFrame(
        [
            ("b1", "u1", "try the mocha", "2020-01-01"),
            ("b1", "u2", "closes late", "2020-01-02"),
            ("b2", "u3", "cash only", "2020-01-03"),
        ],
        YELP_SCHEMAS["tip"],
    )

    user = spark.createDataFrame(
        [("u1", 10), ("u2", 0), ("u3", 5)], YELP_SCHEMAS["user"]
    )

    covid = spark.createDataFrame(
        [
            ("b1", "TRUE"),
            ("b1", "TRUE"),  # exact duplicate row (dropDuplicates, :611)
            ("b2", "FALSE"),
            ("b3", "TRUE"),
            ("b4", "FALSE"),
            ("b5", "TRUE"),  # non-food -> never reaches basetable
            ("b7", "TRUE"),  # no reviews -> dropped by inner join
            ("b8", "FALSE"),
        ],
        YELP_SCHEMAS["covid"],
    )

    return {
        "business": business,
        "review": review,
        "checkin": checkin,
        "tip": tip,
        "user": user,
        "covid": covid,
    }
