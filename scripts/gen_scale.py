#!/usr/bin/env python3
"""Deterministic 10x scale-up of the driver's sf0.1 testdata -> scaledata/sf1.

Scale-sweep infrastructure (BENCH_scale.md): the driver ships sf{0.001,
0.01,0.1}; growth-exponent measurement needs one more decade. This
replays the same SHAPE at 10x rather than bit-replicating rows:

- dimension keys (custkey/orderkey/partkey/suppkey/user_id/doc_id/
  vec_id) are offset per copy so cardinalities grow 10x and referential
  integrity holds across copies;
- value/timestamp/category distributions are preserved verbatim (the
  per-copy marginals are identical to sf0.1);
- document text is token-perturbed per copy (each token replaced with a
  vocab draw with prob 1/3, keyed on xxhash-style integer mixing of
  (doc_id, copy, position)) so copies are NOT near-duplicates of each
  other (mean Jaccard ~0.5, below every dedup threshold) and dup/near-dup
  rates stay collision-driven like the original generator;
- embeddings get deterministic +-0.05 per-dim jitter so no vector has
  exact clones at distance 0.

Everything is seeded by integer mixing -- no RNG state, rerunning gives
byte-identical output. Output schemas are cast to the sf0.1 parquet
schemas exactly (int32 columns stay int32, timestamps stay us).

Usage: gen_scale.py [copies=10] [src=/root/testdata/sf0.1] [dst=scaledata/sf1]
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
DST = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scaledata/sf1")

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")


def mix64(x):
    """splitmix64 finalizer (public domain constants) on uint64 numpy arrays."""
    x = np.asarray(x, dtype=np.uint64).copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def write(table_name, arrow_table):
    src_schema = pq.read_schema(f"{SRC}/{table_name}.parquet")
    # strip pandas metadata; cast to the exact sf0.1 physical schema
    clean = pa.schema([src_schema.field(i) for i in range(len(src_schema.names))])
    out = arrow_table.select(clean.names).cast(clean)
    pq.write_table(out, f"{DST}/{table_name}.parquet")
    print(f"{table_name}: {out.num_rows} rows")


# --- tiny dimensions: verbatim ------------------------------------------------
for t in ["region", "nation"]:
    pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
    print(f"{t}: copied")

# --- keyed relational tables: per-copy key offsets ---------------------------
key_offsets = {}
for t, keys in [("customer", ["c_custkey"]), ("orders", ["o_orderkey", "o_custkey"]),
                ("part", ["p_partkey"]), ("supplier", ["s_suppkey"]),
                ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
                ("events", ["event_id", "user_id"])]:
    for k in keys:
        base = k.split("_", 1)[1] if t != "events" else k
        if base not in key_offsets:
            owner = {"custkey": "customer", "orderkey": "orders", "partkey": "part",
                     "suppkey": "supplier", "event_id": "events",
                     "user_id": "events"}[base]
            col = {"custkey": "c_custkey", "orderkey": "o_orderkey",
                   "partkey": "p_partkey", "suppkey": "s_suppkey",
                   "event_id": "event_id", "user_id": "user_id"}[base]
            key_offsets[base] = con.execute(
                f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{owner}.parquet')"
            ).fetchone()[0]

def offset_expr(col, base, copy):
    return f"{col} + {key_offsets[base] * copy} AS {col}"

for t, keyed in [
    ("customer", {"c_custkey": "custkey"}),
    ("orders", {"o_orderkey": "orderkey", "o_custkey": "custkey"}),
    ("part", {"p_partkey": "partkey"}),
    ("supplier", {"s_suppkey": "suppkey"}),
    ("lineitem", {"l_orderkey": "orderkey", "l_partkey": "partkey",
                  "l_suppkey": "suppkey"}),
    ("events", {"event_id": "event_id", "user_id": "user_id"}),
]:
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
    selects = []
    for copy in range(COPIES):
        exprs = [offset_expr(c, keyed[c], copy) if c in keyed else f'"{c}"'
                 for c in cols]
        selects.append(
            f"SELECT {', '.join(exprs)} FROM read_parquet('{SRC}/{t}.parquet')")
    arrow = con.execute(" UNION ALL ".join(selects)).arrow()
    write(t, arrow)

# --- documents: token-perturbed copies ---------------------------------------
docs = con.execute(
    f"SELECT doc_id, text, lang, source FROM read_parquet('{SRC}/documents.parquet') ORDER BY doc_id"
).fetchall()
vocab = sorted({tok for _, text, _, _ in docs for tok in text.split(" ") if tok})
vocab_arr = np.array(vocab)
n_docs = len(docs)
doc_off = max(d[0] for d in docs) + 1

out_ids, out_text, out_lang, out_src, out_nchars = [], [], [], [], []
for copy in range(COPIES):
    for doc_id, text, lang, source in docs:
        if copy == 0:
            new_text = text
        else:
            toks = text.split(" ")
            seeds = mix64(
                np.uint64(doc_id) * np.uint64(1000003)
                + np.uint64(copy) * np.uint64(9176)
                + np.arange(len(toks), dtype=np.uint64))
            replace = (seeds % np.uint64(3)) == np.uint64(0)
            draws = vocab_arr[(mix64(seeds + np.uint64(1)) %
                               np.uint64(len(vocab_arr))).astype(np.int64)]
            toks = np.where(replace, draws, np.array(toks, dtype=object))
            new_text = " ".join(toks.tolist())
        out_ids.append(doc_id + doc_off * copy)
        out_text.append(new_text)
        out_lang.append(lang)
        out_src.append(source)
        out_nchars.append(len(new_text))
write("documents", pa.table({
    "doc_id": pa.array(out_ids, pa.int64()),
    "text": pa.array(out_text, pa.string()),
    "lang": pa.array(out_lang, pa.string()),
    "source": pa.array(out_src, pa.string()),
    "n_chars": pa.array(out_nchars, pa.int64()),
}))

# --- embeddings: per-copy jitter ---------------------------------------------
emb = con.execute(
    f"SELECT vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
).fetchall()
vec_off = max(e[0] for e in emb) + 1
dim = len(emb[0][1])
ids, vecs, labels = [], [], []
for copy in range(COPIES):
    for vec_id, v, label in emb:
        if copy == 0:
            nv = np.asarray(v, dtype=np.float32)
        else:
            seeds = mix64(
                np.uint64(vec_id) * np.uint64(2654435761)
                + np.uint64(copy) * np.uint64(40503)
                + np.arange(dim, dtype=np.uint64))
            jitter = ((seeds % np.uint64(1000)).astype(np.float64) / 1000.0
                      - 0.4995) * 0.1
            nv = (np.asarray(v, dtype=np.float64) + jitter).astype(np.float32)
        ids.append(vec_id + vec_off * copy)
        vecs.append(nv.tolist())
        labels.append(label)
write("embeddings", pa.table({
    "vec_id": pa.array(ids, pa.int64()),
    "embedding": pa.array(vecs, pa.list_(pa.float32())),
    "label": pa.array(labels, pa.int32()),
}))
print("done ->", DST)
