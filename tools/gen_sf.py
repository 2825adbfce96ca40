#!/usr/bin/env python
"""Deterministic scale-up generator: tile /root/testdata/sf0.1 into an
sfN directory (N an integer multiple of 0.1) for stress sweeps beyond
the driver-provided scales.

Usage: python tools/gen_sf.py [MULTIPLier] [OUT_DIR]
       python tools/gen_sf.py 10 .scratch/sf1     # sf0.1 x10 = sf1

Why tiling, not re-synthesis: the driver's generator is not published,
and the engine's data-dependent predicates (part vocab, date ranges,
event types) must keep firing.  Tiling K shifted copies preserves every
marginal distribution, join fan-out and selectivity EXACTLY while
scaling volume Kx; per-copy key shifts keep the copies disjoint in key
space so no artificial hot keys appear.  Two tables are additionally
perturbed per copy so scale-up does not manufacture degenerate
duplicates:

- documents: ~70% of copied docs get their first token rewritten to a
  copy-tagged token (hash-selected, seed-free determinism) — otherwise
  every doc would have K-1 exact twins and the dedup family's output
  degenerates to one giant cluster per doc;
- embeddings: copied vectors get a +-5e-4 deterministic component-wise
  jitter — otherwise ANN top-k hits K-way exact distance ties.

region/nation are dimension-stable across scale factors (as in TPC-H)
and are copied verbatim.  Everything is hash-derived — no RNG state, so
re-running the script reproduces byte-identical output.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# per-copy key shifts = sf0.1 key-space sizes (keys are 0-based dense)
SHIFTS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}

NAME_PATTERNS = {  # keep name <-> key consistent after the shift
    "customer": ("c_name", "c_custkey", "Customer#{:09d}"),
    "supplier": ("s_name", "s_suppkey", "Supplier#{:09d}"),
}


def _u01(ids: np.ndarray, salt: str) -> np.ndarray:
    """Deterministic uniform [0,1) per id via md5 — no RNG state."""
    out = np.empty(len(ids), dtype=np.float64)
    for i, v in enumerate(ids):
        h = hashlib.md5(f"{salt}:{int(v)}".encode()).digest()
        out[i] = int.from_bytes(h[:8], "big") / 2**64
    return out


def _tile(table: pa.Table, name: str, copy: int) -> pa.Table:
    if copy == 0:
        return table
    cols = {c: table.column(c) for c in table.column_names}
    for key, span in SHIFTS.get(name, {}).items():
        cols[key] = pa.compute.add(cols[key], copy * span)
    if name in NAME_PATTERNS:
        ncol, kcol, fmt = NAME_PATTERNS[name]
        keys = cols[kcol].to_numpy()
        cols[ncol] = pa.array([fmt.format(int(k)) for k in keys], pa.string())
    if name == "documents":
        ids = cols["doc_id"].to_numpy()
        texts = cols["text"].to_pylist()
        pick = _u01(ids, "docmut") < 0.7
        out_t = []
        for i, t in enumerate(texts):
            if pick[i]:
                head, _, rest = t.partition(" ")
                tag = int(
                    hashlib.md5(f"tok:{int(ids[i])}".encode()).hexdigest()[:4],
                    16,
                ) % 100
                t = f"c{copy}tok{tag} {rest}" if rest else f"c{copy}tok{tag}"
            out_t.append(t)
        cols["text"] = pa.array(out_t, pa.string())
        cols["n_chars"] = pa.array(
            [len(t) for t in out_t], table.schema.field("n_chars").type
        )
    if name == "embeddings":
        ids = cols["vec_id"].to_numpy()
        emb = cols["embedding"].to_pylist()
        jit = []
        for i, v in enumerate(emb):
            h = hashlib.md5(f"emb:{int(ids[i])}".encode()).digest()
            # 64 components, one byte of jitter each from two digests
            h2 = hashlib.md5(h).digest()
            bs = (h + h2) * ((len(v) + 31) // 32)
            jit.append(
                [
                    float(np.float32(x + (bs[j] / 255.0 - 0.5) * 1e-3))
                    for j, x in enumerate(v)
                ]
            )
        cols["embedding"] = pa.array(jit, table.schema.field("embedding").type)
    out = pa.table(cols)
    return out.cast(table.schema)


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf1"
    os.makedirs(out_dir, exist_ok=True)
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        if name in ("region", "nation"):
            tiled = src  # dimension tables are scale-invariant
        else:
            tiled = pa.concat_tables(
                [_tile(src, name, c) for c in range(mult)]
            ).cast(src.schema)
        dest = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tiled, dest, row_group_size=1 << 20)
        print(f"{name}: {src.num_rows} -> {tiled.num_rows} rows", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
