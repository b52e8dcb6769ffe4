"""Deterministic scale-factor escalation for the TESTDATA tables.

/root/testdata is read-only and caps at sf0.1, so larger-SF bench
ledgers (BENCH_LEDGER_SF1.json) need self-generated data. This script
builds an sfN directory that is a faithful N/0.1-fold scale-up of the
driver's sf0.1 fixtures (TESTDATA.md, seed=42 like the originals):

- relational tables (customer/supplier/part/orders/lineitem/events):
  key-shifted unions of K = sf/0.1 copies of sf0.1 — every copy's keys
  are offset by i x (max_key+1) so PK uniqueness and every FK
  relationship (lineitem->orders/part/supplier, orders->customer) hold
  across copies; value/timestamp distributions are untouched, so group
  cardinalities scale exactly like a busier system (10x rows per
  orderdate/hour bucket, 10x customers, ...).
- nation/region: fixed dimensions, copied verbatim (they do not scale
  in TPC-H either).
- documents: FRESHLY generated text with a HEAPS-LAW vocabulary
  (numpy, seed=42): vocabulary size grows as ~30 * sqrt(corpus
  tokens) and word ranks are Zipf(s=1.05) draws, matching how real
  text scales. Two reasons this is NOT the driver fixture's 31-word
  generator: (a) a key-shifted copy would give every doc 9
  byte-identical twins and blow the near-dup join fan-out ~100x
  instead of 10x; (b) the 31-word vocabulary SATURATES trigram space
  (~31^3 shingles all occur), which makes every >sf0.1 text-operator
  measurement an adversarial worst case (Sigma df^2 grows
  quadratically) instead of measuring the engine — the round-8 sf3
  ledger's q35/q44 blowups were exactly this fixture artifact
  (SCALE.md round-8 section; VERDICT r8 task #2).
- embeddings: fresh unit-normalized 64-dim Gaussians (seed=42),
  labels uniform over the fixture's 10 classes.

Usage: python gen_sf.py [sf] [out_dir]
       python gen_sf.py 1.0 /tmp/testdata_sf1.0
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
BASE_SF = 0.1

# per-table key columns and their per-copy offset bases (max+1 in sf0.1)
_SHIFTS = {
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
}

_LANGS = ["en", "de", "es", "fr", "zh"]
_LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
# Heaps' law: vocabulary ~ K * tokens^BETA; K=30/BETA=0.5 are standard
# English-corpus constants. Zipf exponent 1.05 keeps a realistic
# frequent-word head without letting a handful of stopwords dominate.
_HEAPS_K = 30.0
_HEAPS_BETA = 0.5
_ZIPF_S = 1.05


def _gen_relational(con, out_dir: str, copies: int) -> None:
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {t}: verbatim")
    for t, shifts in _SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(copies):
            proj = ", ".join(
                f"{c} + {i * shifts[c]} AS {c}" if c in shifts else c
                for c in cols
            )
            selects.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(f"  {t}: {n} rows ({copies} key-shifted copies)")


def _gen_documents(out_dir: str, copies: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 5_000 * copies
    rng = np.random.default_rng(42)
    n_words = rng.integers(10, 101, size=n)
    langs = rng.choice(_LANGS, size=n, p=_LANG_W)
    total_tokens = int(n_words.sum())
    vocab_size = max(2_000, int(_HEAPS_K * total_tokens**_HEAPS_BETA))
    # rank-indexed Zipf draws via inverse CDF over the truncated
    # harmonic weights — one vectorized searchsorted for every token
    w = 1.0 / np.arange(1, vocab_size + 1) ** _ZIPF_S
    cdf = np.cumsum(w / w.sum())
    ranks = np.searchsorted(cdf, rng.random(total_tokens), side="right")
    vocab = np.array([f"w{r}" for r in range(vocab_size)])
    tokens = vocab[np.minimum(ranks, vocab_size - 1)]
    bounds = np.concatenate(([0], np.cumsum(n_words)))
    texts = [
        " ".join(tokens[bounds[i] : bounds[i + 1]]) for i in range(n)
    ]
    print(
        f"  documents vocab: {vocab_size} words over {total_tokens} tokens "
        f"(distinct used: {len(np.unique(ranks))})"
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([str(x) for x in langs]),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet")
    print(f"  documents: {n} fresh rows")


def _gen_embeddings(out_dir: str, copies: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n, dim = 2_000 * copies, 64
    rng = np.random.default_rng(42)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1), pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n), pa.int32()
            ),
        }
    )
    pq.write_table(tbl, f"{out_dir}/embeddings.parquet")
    print(f"  embeddings: {n} fresh rows")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else f"/tmp/testdata_sf{sf}"
    )
    copies = round(sf / BASE_SF)
    assert copies >= 1 and abs(copies * BASE_SF - sf) < 1e-9, (
        f"sf must be a multiple of {BASE_SF}"
    )
    os.makedirs(out_dir, exist_ok=True)
    print(f"generating sf{sf} ({copies}x sf0.1) -> {out_dir}")
    import duckdb

    con = duckdb.connect()
    _gen_relational(con, out_dir, copies)
    _gen_documents(out_dir, copies)
    _gen_embeddings(out_dir, copies)
    print("done")


if __name__ == "__main__":
    main()
