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


def quality_score_from_tokens(toks: Column, col: Column) -> Column:
    """Quality formula over a pre-tokenized column — use this form in
    queries so the text is tokenized once, not once per term."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n = F.size(toks)
    len_term = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    sw_term = F.least((hits.cast("double") / n) * 4, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - non_alpha_ratio(col) * 5)
    return (len_term * 0.4 + sw_term * 0.3 + punct_pen * 0.3).cast("double")


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards moderate length,
    penalizes stopword-free word soup and heavy punctuation. A
    deterministic, SQL-expressible stand-in for learned quality
    classifiers used in pretraining pipelines."""
    return quality_score_from_tokens(tokens(col), col)


def lang_marker_hits(toks: Column, lang: str) -> Column:
    """Number of tokens (with repeats) matching ``lang``'s marker set."""
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda x: F.array_contains(markers, x))).cast("long")


def lang_id_from_tokens(toks: Column) -> Column:
    """Predicted language = strict argmax of marker hits over a
    pre-tokenized column; ties/all-zero -> 'unknown'.

    Implemented as sort-of-(hits, lang)-structs + a top-2 strictness
    check: each language's filter expression appears exactly once. The
    naive pairwise CASE chain references every hit count ~2x per
    language pair, which balloons the codegen'd function (seconds of
    JIT per query). Semantically identical to the pairwise argmax —
    'top1 strictly greater than top2' == 'strictly greater than all'.
    """
    entries = [
        F.struct(lang_marker_hits(toks, lang).alias("h"), F.lit(lang).alias("l"))
        for lang in LANG_MARKERS
    ]
    ranked = F.reverse(F.array_sort(F.array(*entries)))
    top1, top2 = ranked.getItem(0), ranked.getItem(1)
    return F.when(
        (top1.getField("h") > 0) & (top1.getField("h") > top2.getField("h")),
        top1.getField("l"),
    ).otherwise(F.lit("unknown"))


def lang_id(col: Column) -> Column:
    """:func:`lang_id_from_tokens` over freshly tokenized text."""
    return lang_id_from_tokens(tokens(col))


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


# GPT-style pre-tokenizer shape, restricted to constructs RE2 and Java
# regex agree on (no lookahead/backrefs): a token is an optionally
# space-prefixed letter run, digit run, or punctuation run. Counting
# these matches approximates LLM tokenizer counts well enough for
# corpus cost estimation without shipping a vocab.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate LLM-tokenizer token count via the pre-tokenizer
    regex above — JVM-side ``regexp_count``, no UDF, no vocab."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN)).cast("long")
