"""Dump formatted physical plans for the headline queries → PLANS.md.

The scale claims (pushdown, column pruning, whole-stage codegen, broadcast
choices, AQE) should be auditable, not asserted. For each headline query this
writes the `explain('formatted')` output plus a quick check table: does the
parquet scan carry PushedFilters / a pruned ReadSchema, and how many
WholeStageCodegen spans cover the plan.

Usage: python tools/explain_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

AUDIT = [
    "er_minhash_pairs",
    "er_clusters",
    "er_blocking_stats",
    "knn_top5",
    "knn_broadcast",
    "knn_lsh",
    "knn_ivf",
    "knn_ivf_pq",
    "emb_near_dup_lsh",
    "emb_centroid",
    "hard_negatives",
    "pricing_summary",
    "join_topn_revenue",
    "token_matrix",
    "ld_segment_dedup",
    "ta_gopher_rules",
    "knn_ivf_index",
    "knn_ivf_append",
    "ev_capped_sessions",
]


def main() -> int:
    import __spark_entry__ as entrymod
    from mel_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    spark = get_spark("explain_audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    sections = []
    summary = []
    for name in AUDIT:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # formatted mode tags operators with "[codegen id : N]"
        n_codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
        pushed = "PushedFilters: \\[[^]]" in plan or re.search(r"PushedFilters: \[[^\]]", plan) is not None
        read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        pruned = all(len(s.split(",")) <= 6 for s in read_schemas) if read_schemas else None
        bcast = "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        summary.append(
            f"| {name} | {n_codegen} | {'yes' if pushed else 'no'} | "
            f"{'yes' if pruned else ('n/a' if pruned is None else 'CHECK')} | "
            f"{'yes' if bcast else '—'} |"
        )
        sections.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")

    with open(out_md, "w") as f:
        f.write(
            "# PLANS — physical-plan audit of headline queries\n\n"
            f"`explain('formatted')` at {sf_dir}. Summary (NOTE: plans are "
            "pre-execution AdaptiveSparkPlans — AQE assigns most codegen ids "
            "only at runtime, so 'codegen spans' undercounts; pushdown / "
            "pruning / broadcast columns are authoritative):\n\n"
            "| query | codegen spans | pushed filters | scan pruned ≤6 cols | broadcast |\n"
            "|---|---|---|---|---|\n"
        )
        f.write("\n".join(summary) + "\n\n")
        f.write("\n".join(sections))
    print(f"wrote {out_md}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
