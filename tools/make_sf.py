"""Scale /root/testdata/sf0.1 by K into a local measurement dir (default K=10
→ an sf1.0 workload replica). The driver's round-end bench may run at a
driver-generated sf1.0; /root/testdata only ships up to sf0.1, so this tool
builds a statistically faithful stand-in for LOCAL measurement only (never
committed, never read by bench.py unless pointed at it):

 - documents: K replicas; replica k>0 prefixes every token with "r{k}" so
   shingles/bands never collide across replicas → near-dup pair structure
   scales exactly ×K (driver sf1.0 shows 2544 pairs ≈ 10×256);
 - embeddings: K replicas; replica k>0 draws fresh seeded unit vectors (same
   marginal), labels seeded uniform over the same 10; vec_ids offset so the
   query set (vec_id < 50) stays the original 50;
 - events: K replicas with user_id/event_id offsets (drivers sf1.0
   ev_sessionize = 15000 users = 10 × 1500);
 - lineitem/orders/customer/supplier: tiled with key offsets, so filters like
   o_custkey < 100 / l_partkey < 200 keep original-replica-only selectivity
   (matches driver row counts: per_key_cap 300 at both sf0.1 and sf1.0);
 - region/nation/part: copied as-is (dimension tables).

Usage: python tools/make_sf.py /root/sfwork/sf1.0 [K]
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sfwork/sf1.0"
    k_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)

    def rd(name: str) -> pd.DataFrame:
        return pq.read_table(f"{SRC}/{name}.parquet").to_pandas()

    def wr(df: pd.DataFrame, name: str) -> None:
        df.to_parquet(f"{out}/{name}.parquet", index=False)
        print(f"{name}: {len(df)} rows")

    for t in ("region", "nation", "part"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    docs = rd("documents")
    n_docs = len(docs)
    reps = [docs]
    for k in range(1, k_reps):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + k * n_docs
        pre = f"r{k}"
        d["text"] = [" ".join(pre + w for w in t.split(" ")) for t in d["text"]]
        d["n_chars"] = d["text"].str.len()
        reps.append(d)
    wr(pd.concat(reps, ignore_index=True), "documents")

    emb = rd("embeddings")
    n_emb = len(emb)
    dim = len(emb["embedding"].iloc[0])
    reps = [emb]
    for k in range(1, k_reps):
        rng = np.random.default_rng(1000 + k)
        v = rng.standard_normal((n_emb, dim)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        reps.append(
            pd.DataFrame(
                {
                    "vec_id": emb["vec_id"].to_numpy() + k * n_emb,
                    "embedding": list(v),
                    "label": rng.integers(0, 10, n_emb).astype(np.int32),
                }
            )
        )
    wr(pd.concat(reps, ignore_index=True), "embeddings")

    ev = rd("events")
    n_users = int(ev["user_id"].max()) + 1
    reps = [ev]
    for k in range(1, k_reps):
        e = ev.copy()
        e["event_id"] = e["event_id"] + k * len(ev)
        e["user_id"] = e["user_id"] + k * n_users
        reps.append(e)
    wr(pd.concat(reps, ignore_index=True), "events")

    cust = rd("customer")
    orders = rd("orders")
    li = rd("lineitem")
    supp = rd("supplier")
    n_cust = int(cust["c_custkey"].max()) + 1
    n_ord = int(orders["o_orderkey"].max()) + 1
    n_part = int(li["l_partkey"].max()) + 1
    n_supp = int(supp["s_suppkey"].max()) + 1

    def tile(df: pd.DataFrame, offsets: dict[str, int]) -> pd.DataFrame:
        rs = [df]
        for k in range(1, k_reps):
            d = df.copy()
            for col, base in offsets.items():
                d[col] = d[col] + k * base
            rs.append(d)
        return pd.concat(rs, ignore_index=True)

    wr(tile(cust, {"c_custkey": n_cust}), "customer")
    wr(tile(supp, {"s_suppkey": n_supp}), "supplier")
    wr(tile(orders, {"o_orderkey": n_ord, "o_custkey": n_cust}), "orders")
    wr(
        tile(li, {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp}),
        "lineitem",
    )
    print(f"done → {out} (K={k_reps})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
