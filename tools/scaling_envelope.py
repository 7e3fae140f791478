"""Aggregate several solo bench_scaling observations into the disclosed
envelope (VERDICT r3 #4: >=5 solo observations, report median + min).

Usage: python tools/scaling_envelope.py /tmp/scale_r4/run*.json
Prints a JSON summary and a markdown table row per run; paste/merge into
BENCH.md's envelope section.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    runs = []
    for path in sys.argv[1:]:
        try:
            with open(path) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        runs.append(
            {
                "file": path,
                "eff": d["scaling_efficiency"],
                "eff_norm": d["scaling_efficiency_host_normalized"],
                "host_ratio": d["host_capacity_ratio"],
                "n_eps": d["n_executors"]["events_per_sec"],
                "n_trials": d["n_executors"]["trials"],
                "hi_eps": d["4n_executors"]["events_per_sec"],
                "hi_trials": d["4n_executors"]["trials"],
            }
        )
    if not runs:
        print("no parseable runs", file=sys.stderr)
        raise SystemExit(1)
    effs = sorted(r["eff"] for r in runs)
    summary = {
        "observations": len(runs),
        "efficiencies": effs,
        "median": round(statistics.median(effs), 3),
        "min": effs[0],
        "max": effs[-1],
        "target": 0.8,
        "median_pass": statistics.median(effs) >= 0.8,
        "all_pass": effs[0] >= 0.8,
    }
    print(json.dumps(summary, indent=2))
    print()
    print("| run | N ev/s (trials) | 4N ev/s (trials) | efficiency | host-norm |")
    print("|---|---|---|---|---|")
    for i, r in enumerate(runs, 1):
        print(
            f"| {i} | {r['n_eps']:,} {r['n_trials']} | "
            f"{r['hi_eps']:,} {r['hi_trials']} | {r['eff']} | {r['eff_norm']} |"
        )


if __name__ == "__main__":
    main()
