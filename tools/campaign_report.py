"""Render the round-5 gated-campaign table + verdict for BENCH/BASELINE.md.

Usage: python tools/campaign_report.py BENCH/campaign_r5_10M.jsonl
Prints markdown: one row per matched pair (walls, efficiencies, per-leg
probe summary, accepted/reject reasons) and the pre-registered-rule verdict
from bench_scaling.rule_verdict — the same code path the acceptance uses.
"""

import json
import sys

sys.path.insert(0, ".")

from bench_scaling import rule_verdict  # noqa: E402


def main(log: str) -> None:
    v = rule_verdict(log)
    print("| pair | local[2] wall (s) | local[8] wall (s) | eff (whole-job)"
          " | eff (pair stage) | small probe | large probe | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for r in v["pairs"]:
        sp, lp = r["small_probe"], r["large_probe"]

        def _fmt(p):
            b = p.get("spin_burst_frac")
            raw = p.get("spin_burst_frac_raw")
            med = p.get("spin_median_slow")
            s = f"med {med}, burst {b}"
            if raw is not None and raw != b:
                s += f" (raw {raw})"
            return s

        verdict = "**ACCEPTED**" if r["accepted"] else (
            "rejected: " + "; ".join(r["reject_reasons"])
        )
        print(
            f"| {r['pair']} | {r['small_wall']} | {r['large_wall']} | "
            f"{r['eff_e2e']} | {r['eff_pairs']} | {_fmt(sp)} | {_fmt(lp)} | "
            f"{verdict} |"
        )
    print()
    print(f"Accepted pairs: {v['n_accepted']}/{v['n_pairs']}; accepted "
          f"efficiencies {v['accepted_effs']}; "
          f"**median over accepted: {v['median_eff']}**; "
          f"valid (>=3 accepted): {v['valid']}; PASS (median >= 0.8): "
          f"{v['pass']}.")


if __name__ == "__main__":
    main(sys.argv[1])
