"""Scale-up generator for the sf1 evidence run (VERDICT r8 §Next #6).

The driver ships sf{0.001,0.01,0.1} only; the "survives 100x" claim
needs at least one direct measurement above the bench SF. This tool
builds an sfN-shaped dataset from the read-only sf0.1 tables by
key-shifted sharding — N copies of each linear table with every key
column offset by `shard * cardinality` — which preserves exactly the
properties the bench plans are sensitive to:

- join fan-in/fan-out ratios (orders/customer, lineitem/orders,
  events/user) are unchanged per shard, so broadcast-vs-SMJ choices
  and per-key group sizes match a true sfN;
- value distributions (dates, amounts, flags, segment mixes) are the
  driver's own, byte-for-byte;
- group-by cardinalities (users, custkeys, buckets) scale linearly,
  as TPC-H scaling does.

Two tables need more than a key shift, because verbatim copies would
create cross-shard duplicate pairs that a true sfN corpus does not
have (pair counts would grow quadratically in N and near-dup benches
would measure a fiction):

- documents: shard 0 is verbatim. Shards >0 rewrite each text by
  word-shuffling plus substituting SUB_FRAC of words with draws from
  the document's OWN word list (keeps each doc language-pure, and
  makes the rewrite a function of the text alone — the driver's
  planted exact-dup pairs are cross-LANG, so any lang-dependent
  vocabulary would diverge them). The RNG seed is (shard, md5(text))
  — EXACT duplicates share a seed, so the planted exact-dup
  structure survives in every shard (scales linearly), while
  cross-shard copies of the same text diverge to ~zero shingle
  overlap (MinHash shingles are 3-grams, SimHash 2-grams; both are
  order-sensitive, so the shuffle alone already de-pairs them). Planted NEAR-dup (non-identical) pairs survive only in
  shard 0 — the near-dup match density at sfN is therefore ~1/N of
  sf0.1's, which slightly understates the pair-scoring stage; the
  candidate-generation stages (shingle explode, banding shuffle) that
  dominate these queries scale faithfully. Recorded in BASELINE.md.
- embeddings: shard 0 is verbatim. Shards >0 are fresh unit-norm
  samples from the per-label empirical Gaussian (mean + diagonal
  covariance of the sf0.1 vectors with that label), so cluster
  structure matches statistically but no vector is a verbatim copy.

Usage: python tools/gen_sf_scale.py [N] [out_dir]
(default N=10, out_dir=/tmp/sf1). Deterministic: seed=42.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42
SUB_FRAC = 0.15

# table -> key columns to offset by shard * cardinality-of-owning-table
KEY_OWNERS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "__users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
FIXED = ("region", "nation")


def _load(name: str) -> pa.Table:
    return pq.read_table(f"{SRC}/{name}.parquet")


def _card(tables: dict[str, pa.Table], owner: str) -> int:
    if owner == "__users":
        return int(
            pa.compute.max(tables["events"].column("user_id")).as_py() + 1
        )
    return tables[owner].num_rows


def _shift_keys(tbl: pa.Table, name: str, shard: int,
                tables: dict[str, pa.Table]) -> pa.Table:
    for col, owner in KEY_OWNERS.get(name, {}).items():
        off = shard * _card(tables, owner)
        idx = tbl.schema.get_field_index(col)
        shifted = pa.compute.add(tbl.column(col), off).cast(
            tbl.schema.field(col).type
        )
        tbl = tbl.set_column(idx, tbl.schema.field(col), shifted)
    return tbl


def _rewrite_documents(docs: pd.DataFrame, shard: int) -> pd.DataFrame:
    out = docs.copy()
    texts = []
    for text in docs["text"]:
        seed_bytes = hashlib.md5(
            f"{SEED}:{shard}:".encode() + text.encode()
        ).digest()[:8]
        rng = np.random.default_rng(int.from_bytes(seed_bytes, "little"))
        own = np.array(text.split(), dtype=object)
        if len(own) == 0:
            # empty/whitespace-only doc: nothing to shuffle or
            # substitute — rng.integers(0, 0) would raise and abort
            # the whole shard (ADVICE r9 #4)
            texts.append(text)
            continue
        words = own.copy()
        rng.shuffle(words)
        sub = rng.random(len(words)) < SUB_FRAC
        words[sub] = own[rng.integers(0, len(own), int(sub.sum()))]
        texts.append(" ".join(words))
    out["text"] = texts
    out["n_chars"] = [len(t) for t in texts]
    return out


def _resample_embeddings(emb: pd.DataFrame, shard: int) -> pd.DataFrame:
    rng = np.random.default_rng(SEED * 1_000_003 + shard)
    vecs = np.stack(emb["embedding"].values).astype(np.float64)
    labels = emb["label"].values
    new = np.empty_like(vecs)
    for lab in np.unique(labels):
        m = labels == lab
        mu, sd = vecs[m].mean(axis=0), vecs[m].std(axis=0)
        s = mu + sd * rng.standard_normal((int(m.sum()), vecs.shape[1]))
        new[m] = s / np.linalg.norm(s, axis=1, keepdims=True)
    out = emb.copy()
    out["embedding"] = list(new.astype(np.float32))
    return out


def main() -> None:
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)

    tables = {n: _load(n) for n in list(KEY_OWNERS) + list(FIXED)}
    for name in FIXED:
        pq.write_table(tables[name], f"{out_dir}/{name}.parquet")

    docs0 = tables["documents"].to_pandas()
    emb0 = tables["embeddings"].to_pandas()
    emb_schema = tables["embeddings"].schema

    for name in KEY_OWNERS:
        shards = []
        for i in range(n_shards):
            if name == "documents" and i > 0:
                t = pa.Table.from_pandas(
                    _rewrite_documents(docs0, i),
                    schema=tables[name].schema,
                    preserve_index=False,
                )
            elif name == "embeddings" and i > 0:
                t = pa.Table.from_pandas(
                    _resample_embeddings(emb0, i),
                    schema=emb_schema,
                    preserve_index=False,
                )
            else:
                t = tables[name]
            shards.append(_shift_keys(t, name, i, tables))
        full = pa.concat_tables(shards)
        pq.write_table(full, f"{out_dir}/{name}.parquet")
        print(f"{name}: {full.num_rows} rows", flush=True)


if __name__ == "__main__":
    main()
