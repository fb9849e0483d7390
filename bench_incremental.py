"""Incremental-ER scale evidence → BENCH/INCREMENTAL.md.

Claim under test: folding a new batch into a finished run (jobs/er_job.py
--update-base, operators/incremental.py) costs a fraction of a from-scratch
recompute AND emits byte-identical (mention_id, cluster_id) assignments.

Protocol (all runs: fresh spark-submit JVMs, local[32], tmpfs scratch,
identical heap/GC — the bench_scaling.py environment):

  1. generate BASE+BATCH files once (seed 42), split ~10:1 by row hash
  2. full run over BASE                → wall_base   (produces the base ckpt)
  3. incremental fold of BATCH        → wall_inc
  4. full run over BASE ∪ BATCH       → wall_full
  5. assert clusters(incremental) == clusters(full) exactly (DuckDB anti-joins)
  6. report wall_inc / wall_full and the per-stage source of the saving

Usage: python bench_incremental.py [--files 1100000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

SCRATCH = os.environ.get("MEL_BENCH_SCRATCH", "/dev/shm/er_inc_bench")


def submit(job_args: list[str], cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        MEL_SPARK_DRIVER_MEM=os.environ.get("MEL_SPARK_DRIVER_MEM", "24g"),
        MEL_SPARK_LOCAL_DIR=f"{SCRATCH}/local",
    )
    os.makedirs(f"{SCRATCH}/local", exist_ok=True)
    t0 = time.time()
    proc = subprocess.run(
        [
            "spark-submit",
            "--driver-memory", env["MEL_SPARK_DRIVER_MEM"],
            "--conf", "spark.driver.extraJavaOptions=-XX:+UseParallelGC",
            "--conf", "spark.python.worker.faulthandler.enabled=true",
            "--py-files", "/tmp/mel_spark_bench.zip",
            "jobs/er_job.py", *job_args,
        ],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    wall = time.time() - t0
    if proc.returncode != 0:
        print(proc.stderr[-3000:], file=sys.stderr)
        raise RuntimeError("spark-submit failed")
    m = json.loads(proc.stdout.strip().splitlines()[-1])
    m["submit_wall_sec"] = round(wall, 2)
    return m


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=1_100_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2,
                    help="interleaved best-of repeats (this host shows large "
                    "hypervisor-steal swings; best-of filters them)")
    ap.add_argument("--out", default="BENCH/INCREMENTAL.md")
    args = ap.parse_args()

    import zipfile

    import pandas as pd  # noqa: F401 (parquet round-trip)

    from mel_spark.datagen import GenConfig, generate_repos

    with zipfile.ZipFile("/tmp/mel_spark_bench.zip", "w") as z:
        for root, _, files in os.walk("mel_spark"):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, p)

    root_dir = f"/tmp/er_inc_input_{args.files}"
    base_dir, new_dir, full_dir = (
        f"{root_dir}/base", f"{root_dir}/new", f"{root_dir}/full"
    )
    if not os.path.exists(f"{full_dir}/repos.parquet"):
        for d in (base_dir, new_dir, full_dir):
            os.makedirs(d, exist_ok=True)
        tables = generate_repos(GenConfig(n_files=args.files, seed=42))
        repos = tables["repos"]
        import hashlib

        def _is_new(row_key: str) -> bool:
            return int(hashlib.md5(row_key.encode()).hexdigest()[:8], 16) % 11 == 0

        keys = (repos["repo"] + "\x00" + repos["path"] + "\x00" + repos["commit"])
        mask = keys.map(_is_new)
        repos[~mask].to_parquet(f"{base_dir}/repos.parquet", index=False)
        repos[mask].to_parquet(f"{new_dir}/repos.parquet", index=False)
        repos.to_parquet(f"{full_dir}/repos.parquet", index=False)
        print(
            f"generated {len(repos)} files → base {int((~mask).sum())} "
            f"/ new {int(mask.sum())}",
            file=sys.stderr,
        )

    runs: dict[str, list[dict]] = {"base": [], "inc": [], "full": []}
    identical = True
    for rep in range(args.repeats):
        shutil.rmtree(SCRATCH, ignore_errors=True)
        base_ckpt = f"{SCRATCH}/ckpt_base"
        m_base = submit(
            ["--input", base_dir, "--checkpoint", base_ckpt,
             "--output", f"{SCRATCH}/out_base"],
            args.cpus,
        )
        m_inc = submit(
            ["--update-base", base_ckpt, "--input", new_dir,
             "--checkpoint", f"{SCRATCH}/ckpt_inc", "--output", f"{SCRATCH}/out_inc"],
            args.cpus,
        )
        m_full = submit(
            ["--input", full_dir, "--checkpoint", f"{SCRATCH}/ckpt_full",
             "--output", f"{SCRATCH}/out_full"],
            args.cpus,
        )
        runs["base"].append(m_base)
        runs["inc"].append(m_inc)
        runs["full"].append(m_full)
        print(
            f"rep {rep}: base {m_base['elapsed_sec']}s, "
            f"inc {m_inc['elapsed_sec']}s, full {m_full['elapsed_sec']}s",
            file=sys.stderr,
        )

        # exact equivalence of the updated assignment vs the from-scratch run
        import duckdb

        con = duckdb.connect()
        con.sql(f"create view v_inc as select * from '{SCRATCH}/out_inc/clusters.parquet/*.parquet'")
        con.sql(f"create view v_full as select * from '{SCRATCH}/out_full/clusters.parquet/*.parquet'")
        n_inc = con.sql("select count(*) from v_inc").fetchone()[0]
        n_full = con.sql("select count(*) from v_full").fetchone()[0]
        d1 = con.sql(
            "select count(*) from (select mention_id, cluster_id from v_inc "
            "except select mention_id, cluster_id from v_full)"
        ).fetchone()[0]
        d2 = con.sql(
            "select count(*) from (select mention_id, cluster_id from v_full "
            "except select mention_id, cluster_id from v_inc)"
        ).fetchone()[0]
        identical = identical and (n_inc == n_full and d1 == 0 and d2 == 0)
        con.close()

    m_base = min(runs["base"], key=lambda m: m["elapsed_sec"])
    m_inc = min(runs["inc"], key=lambda m: m["elapsed_sec"])
    m_full = min(runs["full"], key=lambda m: m["elapsed_sec"])

    speedup = m_full["elapsed_sec"] / m_inc["elapsed_sec"]
    result = {
        "files": args.files,
        "cpus": args.cpus,
        "base_sec": m_base["elapsed_sec"],
        "incremental_sec": m_inc["elapsed_sec"],
        "full_sec": m_full["elapsed_sec"],
        "speedup_vs_full": round(speedup, 2),
        "new_mentions": m_inc.get("new_mentions"),
        "clusters_identical_to_full": identical,
    }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"""# BENCH — incremental ER vs from-scratch recompute

Same environment as BENCH/BASELINE.md (spark-submit, local[{args.cpus}],
tmpfs scratch, 24g/ParallelGC). Corpus: {args.files} synthetic files
(seed 42), split ~10:1 into a BASE corpus and a NEW batch by row hash.
Best-of-{args.repeats} interleaved repeats per run type (hypervisor-steal
swings on this host reach several x; best-of filters them). Equivalence is
asserted on EVERY repeat.

| run | wall (s) |
|---|---|
| full pipeline over BASE ({m_base.get('rows')} mentions) | {m_base['elapsed_sec']} |
| **incremental fold of the batch ({m_inc.get('new_mentions')} mentions)** | **{m_inc['elapsed_sec']}** |
| full pipeline over BASE ∪ batch ({m_full.get('rows')} mentions) | {m_full['elapsed_sec']} |

**Folding the batch costs {m_inc['elapsed_sec']:.0f} s vs {m_full['elapsed_sec']:.0f} s
for the from-scratch recompute ({speedup:.1f}x), and the updated
(mention_id, cluster_id) assignment is byte-identical to the full run:
{identical}** (both-direction DuckDB EXCEPT = 0 rows).

Why the saving scales: featurization (the dominant stage at every SF —
see BASELINE.md stage walls) runs only over the batch's unseen contents;
blocking touches only the delta (csid, lang) key set; the delta→base probe
is one equi-join against a precomputable block index; clustering collapses
every old cluster to a single super-node, so connected components sees
O(new edges) regardless of corpus history. At a 10^12-file corpus with a
daily 0.1% ingest the full recompute is ~1000x the work of the fold.

Raw JSON (best-of rows):

```json
{json.dumps(m_base)}
{json.dumps(m_inc)}
{json.dumps(m_full)}
```

All repeats (elapsed_sec): base {[m['elapsed_sec'] for m in runs['base']]},
inc {[m['elapsed_sec'] for m in runs['inc']]},
full {[m['elapsed_sec'] for m in runs['full']]}.
""")
    print(json.dumps(result))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
