"""Distributed BPE tokenizer training + pure-expression encoding.

Byte-pair encoding (Sennrich et al. 2016) is THE subword tokenizer of
LLM pretraining; training one over the corpus it will tokenize is a
canonical large-scale pipeline step. The reference only estimates BPE
token counts (operators/text.py bpe-ish regex); this module actually
fits the merge table.

Scale design — why this survives 100 TB:

- The corpus is touched ONCE: a grouped word-count. Everything after
  runs on the DISTINCT-WORD table, which is vocabulary-bounded
  (Heaps' law: millions of rows at web scale, not trillions), kept
  persisted and re-materialized per merge round.
- Each merge round is one grouped aggregation over adjacent symbol
  pairs of that vocab table (weighted by word frequency) + one
  driver-side argmax — the same fit-loop shape as KMeans/label
  propagation (a driver sync per iteration is inherent to greedy BPE;
  every production trainer — SentencePiece, HF tokenizers — has it).
- Applying a merge is a JVM `regexp_replace` on the space-joined
  symbol string (left-to-right non-overlapping == greedy BPE order) —
  no Python, no shuffle.
- ENCODING the corpus afterwards never replays merges per token: the
  trained vocab table IS a word -> subword-array dictionary, broadcast
  to the corpus token stream (`bpe_encode_with_vocab`). Words seen in
  training hit the dictionary; the chained-expression encoder
  (`bpe_encode_expr`) exists for out-of-vocabulary words and small
  merge tables.

Greedy tie-break is (max pair frequency, lexicographic pair) so the
fitted merges are deterministic across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cache import track_cache
from .text import tokens


def _rx_quote(sym: str) -> str:
    """Escape a symbol for a Java regex (char-by-char, no \\Q\\E so
    symbols containing the quoting markers can't break out)."""
    return "".join(c if c.isalnum() else "\\" + c for c in sym)


def _merge_pattern(a: str, b: str) -> str:
    """Match 'a b' as whole space-separated symbols; lookarounds keep
    the match width at exactly the pair, so adjacent occurrences
    ('a a a' with merge (a,a)) collapse left-to-right like greedy
    BPE."""
    return f"(?<=^|\\s){_rx_quote(a)} {_rx_quote(b)}(?=\\s|$)"


def char_symbols(word: Column) -> Column:
    """'abc' -> 'a b c' (space-joined single-char symbols) via a
    zero-width lookaround insert — one JVM regexp, no array round
    trip."""
    return F.regexp_replace(word, r"(?<=.)(?=.)", " ")


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — the ONE full-corpus pass."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_freq: int = 2,
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Fit ``num_merges`` BPE merges on the corpus.

    Returns ``(merges, vocab)`` where ``merges`` is the ordered merge
    list and ``vocab`` is a persisted DataFrame
    ``word, freq, syms: array<string>`` — the word's final subword
    decomposition, ready for :func:`bpe_encode_with_vocab`. Caller
    releases it via ``operators.cache.release_caches`` on a frame the
    vocab is tracked on (or ``vocab.unpersist()``).
    """
    words = (
        word_counts(df, text_col)
        .withColumn("syms", char_symbols(F.col("word")))
        .persist()
    )
    words.count()

    merges: list[tuple[str, str]] = []
    for round_no in range(num_merges):
        pairs = words.select(
            "freq", F.split(F.col("syms"), " ").alias("sa")
        ).select(
            "freq",
            F.explode(
                F.when(
                    F.size("sa") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("sa") - F.lit(1)),
                        lambda i: F.struct(
                            F.element_at(F.col("sa"), i).alias("a"),
                            F.element_at(F.col("sa"), i + F.lit(1)).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("pf"))
            .orderBy(F.col("pf").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .first()
        )
        if top is None or top["pf"] < min_freq:
            break
        a, b = top["p"]["a"], top["p"]["b"]
        merges.append((a, b))

        updated = words.withColumn(
            "syms", F.regexp_replace("syms", _merge_pattern(a, b), a + b)
        )
        if (round_no + 1) % checkpoint_every == 0:
            updated = updated.localCheckpoint(eager=False)
        updated = updated.persist()
        updated.count()
        words.unpersist()
        words = updated

    vocab = words.withColumn("syms", F.split(F.col("syms"), " "))
    return merges, vocab


def bpe_encode_expr(text_col: Column, merges: list[tuple[str, str]]) -> Column:
    """array<string> of BPE tokens for ``text_col`` as ONE static
    Catalyst expression: per word, char-split then the merge chain as
    stacked ``regexp_replace`` nodes. Zero UDF, zero iteration at run
    time — but the plan depth grows with the merge count, so use this
    for OOV fallback / small merge tables and
    :func:`bpe_encode_with_vocab` for corpus encoding."""

    def encode_word(w: Column) -> Column:
        s = char_symbols(w)
        for a, b in merges:
            s = F.regexp_replace(s, _merge_pattern(a, b), a + b)
        return F.split(s, " ")

    return F.flatten(
        F.transform(
            F.filter(tokens(text_col), lambda w: w != F.lit("")),
            encode_word,
        )
    )


def bpe_encode_with_vocab(
    df: DataFrame, text_col: str, id_col: str, vocab: DataFrame
) -> DataFrame:
    """Encode the corpus via the trained word->subwords dictionary:
    explode words WITH POSITION, broadcast-join the vocab (bounded, so
    the hot-word key never shuffles the token stream), reassemble each
    document's subword sequence in order.

    Returns ``id_col, bpe_tokens: array<string>`` (words absent from
    the vocab fall back to their single-char decomposition — by
    construction of BPE every trained word is present, so this only
    fires for unseen data)."""
    positioned = df.select(
        F.col(id_col),
        F.posexplode(F.filter(tokens(F.col(text_col)), lambda w: w != F.lit("")))
        .alias("pos", "word"),
    )
    joined = positioned.join(
        F.broadcast(vocab.select("word", "syms")), "word", "left"
    ).withColumn("syms", F.coalesce(F.col("syms"), F.split(char_symbols("word"), " ")))
    out = (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                    lambda x: x["syms"],
                )
            ).alias("bpe_tokens")
        )
    )
    return track_cache(out, vocab)
