#!/usr/bin/env python
"""Generate a local sf1 dataset (~6M lineitem rows) for the scaling
curve's next decade (r4 VERDICT ask #7).

/root/testdata is read-only and the driver only ships sf<=0.1, so sf1
is synthesized here by 10x replication of sf0.1 with key remapping:
copy k shifts every primary/foreign key by k * stride (stride = one
past the table's max key), which preserves per-key frequency
histograms, join fan-outs, and value distributions while growing
distinct-key cardinalities 10x — the properties the scaling
measurement exercises. Dimension tables (region, nation) stay fixed,
like real star schemas at scale.

Documents and embeddings get a per-copy DISSIMILARITY transform, not
raw replication: copy k rotates each document's word sequence left by
k (intra-copy near-dup/exact-dup structure is preserved — similar
texts stay similar under the same rotation — while cross-copy shingle
overlap collapses), and flips a k-dependent sign mask over embedding
components (cross-copy cosine collapses, intra-copy geometry is
isometric). Raw replication instead multiplies every duplicate group
10x, which grows pair graphs ~100x per decade — a duplicate bomb, not
a bigger corpus; it OOMed the components fixpoint's driver before the
shuffle-hash pin in operators/components.py.

Writes /root/repo/testdata_sf1/*.parquet (gitignored). Idempotent:
skips tables that already exist unless --force.

Round-6 extension (VERDICT r5 ask #6): ``--copies N`` and ``--dest
DIR`` generate other decades with the same construction (e.g.
``--copies 30 --dest testdata_sf3 --tables documents,embeddings`` for
the sf3 confirmation step of the dedup Sigma-df^2 linearity curve);
``--tables`` limits generation to the tables a measurement needs.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DEST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "testdata_sf1")
COPIES = 10


def _arg(flag: str, default):
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default

# table -> {column: stride_source_table}; a column shifts by
# k * (max(key of its source table) + 1) in copy k
REMAP = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "events_user": "user_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> None:
    global COPIES, DEST
    force = "--force" in sys.argv
    COPIES = int(_arg("--copies", COPIES))
    DEST = _arg("--dest", DEST)
    if not os.path.isabs(DEST):
        DEST = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), DEST)
    only = _arg("--tables", None)
    only = set(only.split(",")) if only else None
    os.makedirs(DEST, exist_ok=True)
    con = duckdb.connect()
    strides: dict[str, int] = {}
    for name, key in KEY_OF.items():
        table = "events" if name == "events_user" else name
        strides[name] = (
            con.execute(
                f"SELECT max({key}) + 1 FROM read_parquet('{SRC}/{table}.parquet')"
            ).fetchone()[0]
        )
    for table, remap in REMAP.items():
        if only is not None and table not in only:
            continue
        out = f"{DEST}/{table}.parquet"
        if os.path.exists(out) and not force:
            print(f"skip {table} (exists)")
            continue
        if not remap:  # fixed dimension: copy once
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{table}.parquet')) "
                f"TO '{out}' (FORMAT PARQUET)"
            )
            print(f"wrote {table} (dim, 1 copy)")
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
            ).fetchall()
        ]

        def expr(c: str) -> str:
            if c in remap:
                return f"({c} + k.k * {strides[remap[c]]}) AS {c}"
            if table == "documents" and c == "text":
                # copy k deals the word sequence into k+1 piles (copy 0
                # = original). NOT a rotation: rotations preserve the
                # circular n-gram multiset, so rotated copies stayed
                # near-dup cliques and the pair graph still grew ~100x;
                # the stride permutation destroys local word order, so
                # cross-copy shingle overlap actually collapses while
                # same-copy similar docs stay similar (same permutation)
                return (
                    "CASE WHEN k.k = 0 THEN text ELSE array_to_string("
                    "flatten(list_transform(range(0, k.k + 1), "
                    "j -> list_filter(string_split(text, ' '), "
                    "(w, i) -> (i - 1) % (k.k + 1) = j))), ' ') END AS text"
                )
            if table == "documents" and c == "n_chars":
                return "n_chars"  # same words, joined by single spaces
            if table == "embeddings" and c == "embedding":
                # k-dependent sign mask: intra-copy geometry isometric,
                # cross-copy cosine collapses (k=0 = identity)
                return (
                    "list_transform(embedding, "
                    "(x, i) -> CASE WHEN k.k > 0 AND (i + k.k) % (k.k + 1) = 0 "
                    "THEN -x ELSE x END) AS embedding"
                )
            return c

        select = ", ".join(expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {select} "
            f"FROM read_parquet('{SRC}/{table}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({COPIES})) AS k) k) "
            f"TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"wrote {table}: {n} rows ({COPIES} remapped copies)")


if __name__ == "__main__":
    main()
