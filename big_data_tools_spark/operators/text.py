"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.11).

Beyond-reference north-star surface: tokenization, quality scoring,
n-gram language ID, document fingerprinting, shingling. All pure
column expressions (JVM-side, whole-stage-codegen friendly) — no
Python UDFs, so every op here is also DuckDB-oracle checkable and
scales linearly with input.

Tokenization contract: ``lower(text)`` split on single spaces — chosen
to be bit-identical between Spark ``split`` and DuckDB
``string_split`` so oracle checks stay exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small disjoint stopword lists per language for the n-gram/stopword
# language-ID heuristic. Public knowledge (standard stopword sets).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["les", "une", "est", "dans", "pour"],
    "es": ["los", "una", "por", "para", "como"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(col: Column) -> Column:
    """lower + single-space split (see module contract)."""
    return F.split(F.lower(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def avg_token_len(col: Column) -> Column:
    """Mean characters per token (double; null on empty)."""
    t = tokens(col)
    total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x))
    return total.cast("double") / F.size(t)


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are stopwords (counts repeats)."""
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    t = tokens(col)
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return hits.cast("double") / F.size(t)


def non_alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are not [a-z0-9 ] after lowering."""
    lowered = F.lower(col)
    stripped = F.regexp_replace(lowered, "[a-z0-9 ]", "")
    return F.length(stripped).cast("double") / F.length(lowered)


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards moderate length,
    penalizes stopword-free word soup and heavy punctuation. A
    deterministic, SQL-expressible stand-in for learned quality
    classifiers used in pretraining pipelines."""
    n = token_count(col)
    len_term = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(col) * 4, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - non_alpha_ratio(col) * 5)
    return (len_term * 0.4 + sw_term * 0.3 + punct_pen * 0.3).cast("double")


def lang_marker_hits(col: Column, lang: str) -> Column:
    """Number of tokens (with repeats) matching ``lang``'s marker set."""
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens(col), lambda x: F.array_contains(markers, x))).cast("long")


def lang_id(col: Column) -> Column:
    """Predicted language = argmax of marker hits; ties/all-zero ->
    'unknown'. Strict-argmax CASE chain keeps it deterministic and
    SQL-twin-able."""
    hits = {lang: lang_marker_hits(col, lang) for lang in LANG_MARKERS}
    expr = None
    for lang, h in hits.items():
        others = [hits[o] for o in LANG_MARKERS if o != lang]
        cond = (h > 0)
        for o in others:
            cond = cond & (h > o)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    assert expr is not None
    return expr.otherwise(F.lit("unknown"))


def fingerprint(col: Column) -> Column:
    """Exact-dup fingerprint: md5 of whitespace-normalized lowercase
    text. md5 (not xxhash64) so DuckDB computes the identical digest."""
    normalized = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return F.md5(normalized)


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string> (empty if fewer
    than ``n`` tokens)."""
    t = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
