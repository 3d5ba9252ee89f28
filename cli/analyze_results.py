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
    p.add_argument(
        "--ladder", default=None,
        help="optional output CSV of the improvements ladder (SGM10 KKT "
        "per rung + ratio vs the previous rung; reference "
        "analyze_csv_data.py:100-115)",
    )
    p.add_argument(
        "--per_dataset", default=None,
        help="optional output CSV of per-family solved counts and SGM10 "
        "(reference per-dataset tables, analyze_csv_data.py:438-459)",
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

    if args.ladder:
        write_ladder(by_label, args)

    if args.per_dataset:
        write_per_dataset(by_label, args)


LADDER_ORDER = [
    "pdhg_vanilla_1e-4",
    "pdhg_restarts_1e-4",
    "pdhg_scaling_1e-4",
    "pdhg_primal_weight_1e-4",
    "pdhg_stepsize_1e-4",
    "pdlp_1e-4",
]


def _sgm_kkt(group, args):
    kkt = []
    solved = 0
    for row in group:
        if row["termination_reason"].endswith("OPTIMAL"):
            solved += 1
            kkt.append(
                min(float(row["cumulative_kkt_matrix_passes"]),
                    args.kkt_budget)
            )
        else:
            kkt.append(args.kkt_budget)
    return solved, shifted_geomean(kkt, args.shift)


def write_ladder(by_label, args):
    """Improvements ladder: each rung's SGM10 KKT passes and the ratio
    vs the previous rung (reference IMPROVEMENTS_ORDER)."""
    rows = []
    prev = None
    for label in LADDER_ORDER:
        if label not in by_label:
            continue
        solved, sgm = _sgm_kkt(by_label[label], args)
        ratio = (prev / sgm) if (prev and sgm > 0) else float("nan")
        rows.append([label, len(by_label[label]), solved,
                     round(sgm, 2), round(ratio, 3)])
        prev = sgm
    with open(args.ladder, "w", newline="") as f:
        cw = csv.writer(f)
        cw.writerow(["experiment_label", "instances", "solved",
                     "sgm10_kkt_passes", "improvement_vs_previous"])
        cw.writerows(rows)


def _family(instance_name):
    """Strips trailing size/seed qualifiers: transport_small ->
    transport, random_sparse_1 -> random_sparse, pagerank_2k ->
    pagerank."""
    import re

    out = re.sub(
        r"_(?:small|mid|large|wide|tall|\d+[a-z]*)$", "", instance_name
    )
    return out or instance_name


def write_per_dataset(by_label, args):
    rows = []
    for label, group in sorted(by_label.items()):
        fams = defaultdict(list)
        for row in group:
            fams[_family(row["instance_name"])].append(row)
        for fam, g in sorted(fams.items()):
            solved, sgm = _sgm_kkt(g, args)
            rows.append([label, fam, len(g), solved, round(sgm, 2)])
    with open(args.per_dataset, "w", newline="") as f:
        cw = csv.writer(f)
        cw.writerow(["experiment_label", "family", "instances", "solved",
                     "sgm10_kkt_passes"])
        cw.writerows(rows)


if __name__ == "__main__":
    main()
