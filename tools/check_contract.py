"""Local twin of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 in Spark AND its
oracle_sql() twin in DuckDB; compares row count, column names, and exact
(order-insensitive, column-name-sorted) values. Float comparison is exact —
stricter than any value-hash the driver can use.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from mel_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
                vals.append(int(v))
            elif isinstance(v, (np.floating, float)):
                f = float(v)
                vals.append("nan" if math.isnan(f) else f)
            elif isinstance(v, (list, np.ndarray)):
                vals.append(tuple(v))
            else:
                vals.append(v)
        rows.append(tuple(vals))
    return cols, sorted(rows, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("contract_check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    import time

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        print(f"{name} ...", flush=True)
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"{name:24s} SPARK ERROR: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"{name:24s} rows={len(sdf)} (no oracle: rows-only check)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"{name:24s} ORACLE ERROR: {str(e)[:200]}")
            continue
        sc, sr = canon(sdf)
        dc, dr = canon(ddf)
        status = []
        if len(sr) != len(dr):
            status.append(f"ROWS {len(sr)}!={len(dr)}")
        if sc != dc:
            status.append(f"COLS {sc}!={dc}")
        if not status and sr != dr:
            bad = next(i for i, (x, y) in enumerate(zip(sr, dr)) if x != y)
            status.append(f"VALUES row{bad}: {sr[bad]} != {dr[bad]}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"{name:24s} MISMATCH: {'; '.join(status)[:300]}", flush=True)
        else:
            print(f"{name:24s} OK rows={len(sr)} ({time.time() - t0:.1f}s)", flush=True)
    spark.stop()
    print(f"\n{len(qs) - len(failures)}/{len(qs)} matched" if not only else "")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
