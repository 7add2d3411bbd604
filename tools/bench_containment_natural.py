"""A/B the two exact-ish containment tiers on a NATURAL-vocabulary
corpus (Heaps growth), the regime the capped path's df-cap analysis
says the prefix path is built for.

The committed testdata documents draw from a FIXED vocabulary, so by
sf1 every shingle is hot (df ~ O(n)) and prefix filtering has no rare
tokens to exploit — the r9 A/B on that corpus measured the prefix
path at ~1.3x the capped path. Real crawls are not like that:
vocabulary grows ~ n^beta (Heaps), most shingles are RARE, and the
prefix path's candidate mass tracks rare-token postings while the
sqrt(n) df cap starts dropping evidence shingles. This tool builds a
deterministic Zipf-sampled corpus (unbounded-ish vocab, so observed
vocabulary grows with the corpus), injects known quote-containment
pairs, and times both paths at two corpus sizes in one session
(alternating A/B/A/B, best-of-2 each).

Usage: python tools/bench_containment_natural.py [n_small n_large]
Prints one JSON line; the table lands in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/bdt_natural_corpus"


def gen_corpus(n_docs: int, path: str) -> None:
    """Deterministic Heaps-growth corpus: Zipf(s=1.3) word ranks over
    an effectively unbounded vocabulary; every 20th doc is a LONGER
    doc that embeds the full text of an earlier short doc (the
    quote/excerpt scenario containment exists to catch)."""
    rng = np.random.default_rng(7)
    docs: list[str] = []
    for i in range(n_docs):
        length = int(rng.integers(30, 120))
        ranks = rng.zipf(1.3, size=length)
        words = [f"w{r}" for r in ranks]
        if i % 20 == 19 and i >= 20:
            # embed the ENTIRE earlier doc so its full shingle set is
            # contained (containment ~1.0 > threshold). i-19 is never
            # itself a quote host ((i-19) % 20 == 0), so doc lengths
            # stay bounded instead of chaining hosts into hosts
            quoted = docs[i - 19].split(" ")
            cut = length // 2
            words = words[:cut] + quoted + words[cut:]
        docs.append(" ".join(words))
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype="int64"), "text": docs})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000

    from big_data_tools_spark.operators.cache import (
        release_all_caches,
        release_caches,
    )
    from big_data_tools_spark.operators.dedup import (
        containment_pairs,
        containment_prefix_pairs,
    )
    from big_data_tools_spark.session import get_spark

    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="bdt-containment-natural")
    result: dict = {"sizes": {}}
    for n in (n_small, n_large):
        path = os.path.join(OUT, f"docs_{n}.parquet")
        if not os.path.exists(path):
            gen_corpus(n, path)
        d = spark.read.parquet(path)

        def timed(fn):
            best, pairs = float("inf"), 0
            for _ in range(2):
                t0 = time.perf_counter()
                df = fn(d, "text", "doc_id", n=3,
                        threshold_micro=900_000, min_shingles=5)
                pairs = df.count()
                release_caches(df)
                release_all_caches()
                best = min(best, time.perf_counter() - t0)
            return round(best, 2), pairs

        capped_sec, capped_pairs = timed(
            lambda *a, **k: containment_pairs(*a, max_doc_freq="auto", **k)
        )
        prefix_sec, prefix_pairs = timed(containment_prefix_pairs)
        # distinct vocabulary, for the Heaps claim
        from pyspark.sql import functions as F
        vocab = (
            d.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
            .filter("w <> ''").agg(F.count_distinct("w")).first()[0]
        )
        result["sizes"][n] = {
            "vocab": vocab,
            "capped": {"sec": capped_sec, "pairs": capped_pairs},
            "prefix": {"sec": prefix_sec, "pairs": prefix_pairs},
        }
        print(f"# n={n} vocab={vocab} capped {capped_sec}s/{capped_pairs}p "
              f"prefix {prefix_sec}s/{prefix_pairs}p", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
