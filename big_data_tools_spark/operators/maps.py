"""Stringly-typed map parsing + dummy encoding (SURVEY.md §2.7 X5-X9, §2.5 A5).

The reference cleans Python-dict-literal strings like
``"{'romantic': True, 'casual': False}"`` with
``translate(col, "{}'", "")`` then ``split`` + ``create_map`` and
explodes to key/value rows (``Databricks Notebook.py:284-322``), four
times over (Ambience, BusinessParking, DietaryRestrictions,
GoodForMeal; ``:310-347,362-387,402-427,442-464``). Here that block is
ONE parameterized operator; the preferred ingest path is
:func:`parse_dict_literal_json` (a single ``from_json`` after quote
normalization — one expression, Catalyst-optimizable).

All pure column expressions — no UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_dict_literal(col: Column) -> Column:
    """Reference-faithful parse: strip ``{}'`` punctuation, split on
    ``,`` then ``:``, build a MapType column.

    Keeps the reference's quirk that values carry a leading space
    (``" True"``) from the ``", "`` split (``:336``) — callers filter
    on the raw value or trim explicitly.
    """
    cleaned = F.translate(col, "{}'", "")
    entries = F.split(cleaned, ",")
    return F.map_from_arrays(
        F.transform(entries, lambda e: F.split(e, ":").getItem(0)),
        F.transform(entries, lambda e: F.split(e, ":").getItem(1)),
    )


def parse_dict_literal_json(col: Column) -> Column:
    """Scale-preferred parse: normalize Python-literal quirks (single
    quotes, ``True/False/None``) and parse with one ``from_json`` to
    ``map<string,string>``."""
    normalized = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.translate(col, "'", '"'), r"\bTrue\b", "true"),
            r"\bFalse\b",
            "false",
        ),
        r"\bNone\b",
        "null",
    )
    return F.from_json(normalized, "map<string,string>")


def explode_map_entries(
    df: DataFrame, map_col: Column, id_col: str, key_out: str = "key", val_out: str = "value"
) -> DataFrame:
    """Map column -> (id, key, value) rows (reference ``:322``)."""
    return df.select(F.col(id_col), F.explode(map_col).alias(key_out, val_out))


def pivot_dummies(
    df: DataFrame,
    id_col: str,
    key_col: str,
    values: list[str],
    fill: int = 0,
) -> DataFrame:
    """Long key rows -> wide 0/1 dummy matrix (reference ``:342`` etc.).

    ``values`` is REQUIRED: passing the explicit key list removes the
    extra distinct-scan job ``pivot`` otherwise runs, and makes the
    output schema deterministic (needed for oracle checks and for any
    100 TB run — an unbounded pivot is a driver OOM).
    """
    return (
        df.groupBy(id_col)
        .pivot(key_col, values)
        .agg(F.lit(1))
        .na.fill(fill)
    )
