"""Benchmark analysis: solved counts and shifted geometric means.

Implements the reference methodology (scripts/analyze_csv_data.py):
- an instance counts as solved iff termination_reason == OPTIMAL,
- unsolved instances are penalized at the budget (PAR = 1),
- shifted geometric mean with shift = 10:
      SGM10(x) = geomean(x + 10) - 10
- per-experiment summary over KKT passes and solve seconds, plus
  fraction-solved-vs-KKT-pass-budget curves.

Usage:
    python cli/analyze_results.py results.csv --kkt_budget 1e5 \
        --time_budget 3600 [--curves curves.csv] > summary.csv
"""

import argparse
import csv
import math
import sys
from collections import defaultdict


def shifted_geomean(values, shift=10.0):
    if not values:
        return float("nan")
    log_sum = 0.0
    for v in values:
        log_sum += math.log(v + shift)
    return math.exp(log_sum / len(values)) - shift


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("csv_path")
    p.add_argument("--kkt_budget", type=float, default=1e5)
    p.add_argument("--time_budget", type=float, default=3600.0)
    p.add_argument("--shift", type=float, default=10.0)
    p.add_argument(
        "--curves", default=None,
        help="optional output CSV of fraction-solved vs KKT-pass budget",
    )
    args = p.parse_args()

    with open(args.csv_path) as f:
        rows = list(csv.DictReader(f))

    by_label = defaultdict(list)
    for row in rows:
        by_label[row["experiment_label"]].append(row)

    writer = csv.writer(sys.stdout)
    writer.writerow(
        [
            "experiment_label",
            "instances",
            "solved",
            "sgm10_kkt_passes",
            "sgm10_solve_time_sec",
        ]
    )
    curve_rows = []
    for label, group in sorted(by_label.items()):
        kkt, secs, solved_kkts = [], [], []
        solved = 0
        for row in group:
            is_solved = row["termination_reason"].endswith("OPTIMAL")
            if is_solved:
                solved += 1
                kkt_val = float(row["cumulative_kkt_matrix_passes"])
                kkt.append(min(kkt_val, args.kkt_budget))
                secs.append(min(float(row["solve_time_sec"]),
                                args.time_budget))
                solved_kkts.append(kkt_val)
            else:
                kkt.append(args.kkt_budget)
                secs.append(args.time_budget)
        writer.writerow(
            [
                label,
                len(group),
                solved,
                round(shifted_geomean(kkt, args.shift), 2),
                round(shifted_geomean(secs, args.shift), 3),
            ]
        )
        if args.curves:
            solved_kkts.sort()
            budget = 1.0
            while budget <= args.kkt_budget:
                frac = sum(1 for v in solved_kkts if v <= budget) / len(group)
                curve_rows.append([label, budget, frac])
                budget *= 10 ** 0.25
    if args.curves:
        with open(args.curves, "w", newline="") as f:
            cw = csv.writer(f)
            cw.writerow(["experiment_label", "kkt_budget", "fraction_solved"])
            cw.writerows(curve_rows)


if __name__ == "__main__":
    main()
