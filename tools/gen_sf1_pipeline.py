"""Synthesize an sf1-scale documents/embeddings pair for the
LLM-pipeline growth probe (r10, VERDICT r9 #4).

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md: read-only, do
not regenerate), so the 10x step is BUILDER-synthesized: same
schemas, same marginals read off sf0.1 (token vocabulary, text
length profile, lang/source mix, 64-dim float32 embeddings over 10
labels, a small exact-duplicate fraction), seed 42, 10x the rows.
It is a TIME-GROWTH corpus — the absolute distribution match is
approximate by construction (the driver's generator is not public to
this repo), which measures scaling honestly but is NOT an oracle
fixture; nothing here feeds the correctness gate.

Usage: python tools/gen_sf1_pipeline.py [outdir=/tmp/sf1_pipeline]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SCALE = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_pipeline"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    con = duckdb.connect()

    docs = con.sql(
        f"SELECT * FROM read_parquet('{SRC}/documents.parquet')"
    ).df()
    vocab = sorted({t for s in docs["text"] for t in s.split()})
    n_tokens = docs["text"].str.split().str.len().to_numpy()
    langs, lang_p = np.unique(docs["lang"], return_counts=True)
    srcs, src_p = np.unique(docs["source"], return_counts=True)
    n_docs = len(docs) * SCALE

    lens = rng.choice(n_tokens, n_docs)
    vocab_arr = np.array(vocab)
    texts = [
        " ".join(vocab_arr[rng.integers(0, len(vocab_arr), k)])
        for k in lens
    ]
    # the same small exact-duplicate fraction sf0.1 carries (~0.2%)
    n_dup = int(n_docs * 0.002)
    dup_to = rng.integers(0, n_docs, n_dup)
    dup_from = rng.integers(0, n_docs, n_dup)
    for a, b in zip(dup_to, dup_from):
        texts[a] = texts[b]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(
            rng.choice(langs, n_docs, p=lang_p / lang_p.sum()), pa.string()
        ),
        "source": pa.array(
            rng.choice(srcs, n_docs, p=src_p / src_p.sum()), pa.string()
        ),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")

    n_emb = con.sql(
        f"SELECT count(*) FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0] * SCALE
    # 10 label clusters in 64-dim: centers + noise, like the fixture's
    # label structure (labels 0-9, isotropic around centers)
    centers = rng.normal(0, 1, (10, 64)).astype(np.float32)
    labels = rng.integers(0, 10, n_emb)
    vecs = (
        centers[labels] + rng.normal(0, 0.6, (n_emb, 64))
    ).astype(np.float32)
    tbl2 = pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl2, f"{out}/embeddings.parquet")

    # events / orders / lineitem (r11, VERDICT r10 #4): the iterative
    # heavies' growth probe needs 10x relational inputs too. Key-offset
    # copies: each copy shifts every id/key by copy*max_key, so joins
    # stay key-correct (10 disjoint replicas of the same join graph =
    # honest 10x node/edge growth for pagerank; timestamps shift by
    # copy*1s so event overlap structure is preserved, not piled up).
    for t, keys, ts_cols in (
        ("events", ("event_id", "user_id"), ("ts",)),
        ("orders", ("o_orderkey", "o_custkey"), ("o_orderdate",)),
        ("lineitem", ("l_orderkey", "l_partkey", "l_suppkey"), ("l_shipdate",)),
    ):
        src = con.sql(
            f"SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        ).arrow()
        offs = {k: int(con.sql(
            f"SELECT max({k}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]) for k in keys}
        copies = []
        for c in range(SCALE):
            cols = {}
            for name in src.column_names:
                col = src.column(name)
                if name in keys:
                    col = pa.compute.add(col, c * offs[name])
                elif name in ts_cols and c:
                    col = pa.compute.add(
                        col, pa.scalar(c * 1_000_000, pa.duration("us"))
                    )
                cols[name] = col
            copies.append(pa.table(cols))
        pq.write_table(pa.concat_tables(copies), f"{out}/{t}.parquet")

    print(
        f"wrote {out}: documents={n_docs} embeddings={n_emb} "
        f"events/orders/lineitem x{SCALE}"
    )


if __name__ == "__main__":
    main()
