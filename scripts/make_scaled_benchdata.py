"""Amplify /root/testdata/sf0.1 into a derived sf1 bench directory.

The driver ships sf0.001/0.01/0.1 only; the 100×-design argument needs
at least one order of magnitude of EMPIRICAL scaling confirmation
(VERDICT r4 "Next round" #3). This derives sf1 = 10 shifted copies of
sf0.1, preserving the invariants the engine's cost model depends on:

- FK consistency: every key column shifts by copy_index * KEYSTRIDE,
  so joins have the same per-key fanout as the source (10x rows, 10x
  distinct keys — NOT 10x fanout per key, which would be a different
  workload, and NOT colliding keys).
- No replication artifacts in dedup/similarity: copy i>0 suffixes
  every token with "_r{i}" (disjoint token/shingle sets across copies,
  so MinHash/SimHash candidate pairs scale with corpus size, not
  quadratically with the copy count) and sign-flips embedding
  dimensions by parity of popcount(dim & copy) (a per-copy orthogonal
  diagonal transform: norms preserved, cross-copy cosines ~0, so ANN /
  embedding near-dup don't see 10 exact twins of every vector).
- Dimensions (region, nation) stay fixed, as TPC-H scaling does.

Usage: python scripts/make_scaled_benchdata.py [src_dir out_dir copies]
Defaults: /root/testdata/sf0.1 -> <repo>/.benchdata/sf1, 10 copies.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

KEYSTRIDE = 100_000_000

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]

_TOKEN = re.compile(r"[A-Za-z0-9_]+")


def _suffix_tokens(text: str, tag: str) -> str:
    return _TOKEN.sub(lambda m: m.group(0) + tag, text)


def _sign_pattern(dim: int, copy: int) -> np.ndarray:
    d = np.arange(dim)
    pop = np.zeros(dim, dtype=np.int64)
    v = d & copy
    while v.any():
        pop += v & 1
        v >>= 1
    return np.where(pop % 2 == 0, 1.0, -1.0)


def amplify(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    for name in COPY_AS_IS:
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{out}/{name}.parquet")
        print(f"{name}: copied")
    for name, keys in SHIFT_COLS.items():
        base = pq.read_table(f"{src}/{name}.parquet").to_pandas()
        parts = []
        for i in range(copies):
            c = base.copy()
            for k in keys:
                c[k] = c[k] + i * KEYSTRIDE
            if name == "documents" and i > 0:
                tag = f"_r{i}"
                c["text"] = [_suffix_tokens(t, tag) for t in c["text"]]
                c["n_chars"] = c["text"].str.len().astype(base["n_chars"].dtype)
            if name == "embeddings" and i > 0:
                dim = len(base["embedding"].iloc[0])
                sign = _sign_pattern(dim, i)
                c["embedding"] = [
                    (np.asarray(v, dtype=np.float32) * sign).astype(np.float32)
                    for v in c["embedding"]
                ]
            parts.append(c)
        big = pd.concat(parts, ignore_index=True)
        schema = pq.read_schema(f"{src}/{name}.parquet")
        # many part FILES (a directory named <name>.parquet): Spark's
        # scan parallelism — and therefore every pushed-down filter's
        # parallelism — follows the file-split count, and a single
        # 30 MB file yields ONE split at the default 128 MB
        # maxPartitionBytes, serializing regex-heavy scans onto 2
        # tasks. A real 10x corpus is many files; no 100 TB table has
        # this small-file artifact.
        d = f"{out}/{name}.parquet"
        os.makedirs(d, exist_ok=True)
        n_files = min(32, max(1, len(big) // 1024))
        step = -(-len(big) // n_files)
        for fi in range(n_files):
            chunk = big.iloc[fi * step:(fi + 1) * step]
            if len(chunk) == 0:
                continue
            pq.write_table(pa.Table.from_pandas(chunk, schema=schema,
                                                preserve_index=False),
                           f"{d}/part-{fi:05d}.parquet")
        print(f"{name}: {len(base)} -> {len(big)} rows in {n_files} files")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, ".benchdata", "sf1")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    amplify(src, out, copies)
