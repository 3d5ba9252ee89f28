"""Aggregates *_summary.json SolveLogs into a CSV.

Layout-file contract and output columns mirror the reference
benchmarking/process_json_to_csv.jl: the layout JSON lists datasets
(config dict + logs_directory) and config_labels; each row of the CSV is
one solve with the config columns, SolveLog summary fields and the
ConvergenceInformation entry matching the solution point type.

Usage: python cli/process_json_to_csv.py layout.json output.csv
"""

import csv
import glob
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from firstorderlp_tpu.solve_log import solve_log_from_json  # noqa: E402

SOLVE_LOG_FIELDS = [
    "instance_name",
    "termination_reason",
    "iteration_count",
    "solve_time_sec",
]

CONVERGENCE_INFORMATION_FIELDS = [
    "primal_objective",
    "dual_objective",
    "relative_optimality_gap",
    "l2_primal_residual",
    "l_inf_primal_residual",
    "l2_dual_residual",
    "l_inf_dual_residual",
    "relative_l2_primal_residual",
    "relative_l_inf_primal_residual",
    "relative_l2_dual_residual",
    "relative_l_inf_dual_residual",
    "l_inf_primal_variable",
    "l2_primal_variable",
    "l_inf_dual_variable",
]


def solve_log_to_row(log):
    row = {}
    for field in SOLVE_LOG_FIELDS:
        value = getattr(log, field)
        row[field] = value.name if hasattr(value, "name") else value
    row["cumulative_kkt_matrix_passes"] = (
        log.solution_stats.cumulative_kkt_matrix_passes
    )
    for conv in log.solution_stats.convergence_information:
        if conv.candidate_type == log.solution_type:
            for field in CONVERGENCE_INFORMATION_FIELDS:
                row[field] = getattr(conv, field)
            break
    return row


def read_dataset(dataset_list) -> list:
    rows = []
    config_labels = dataset_list["config_labels"]
    for dataset in dataset_list["datasets"]:
        assert set(config_labels) == set(dataset["config"].keys())
        logs_directory = dataset["logs_directory"]
        experiment_label = ",".join(
            dataset["config"][c] for c in config_labels
        )
        log_files = sorted(
            glob.glob(os.path.join(logs_directory, "*_summary.json"))
        )
        if not log_files:
            print(
                f"warning: no *_summary.json files found in {logs_directory}",
                file=sys.stderr,
            )
        for filename in log_files:
            with open(filename) as f:
                log = solve_log_from_json(f.read())
            row = {"experiment_label": experiment_label}
            for label in config_labels:
                row[label] = dataset["config"][label]
            row.update(solve_log_to_row(log))
            rows.append(row)
    if not rows:
        raise RuntimeError(
            "No *_summary.json files present in any of the logs directories."
        )
    return rows


def main():
    if len(sys.argv) != 3:
        raise SystemExit(
            "Usage: process_json_to_csv.py dataset_list_json|logs_dir "
            "output_csv"
        )
    if os.path.isdir(sys.argv[1]):
        # Convenience beyond the reference contract: aggregate one logs
        # directory without writing a layout file first.
        dataset_list = {
            "datasets": [
                {"config": {}, "logs_directory": sys.argv[1]}
            ],
            "config_labels": [],
        }
    else:
        with open(sys.argv[1]) as f:
            dataset_list = json.load(f)
    rows = read_dataset(dataset_list)
    fieldnames = list(rows[0].keys())
    with open(sys.argv[2], "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fieldnames)
        writer.writeheader()
        writer.writerows(rows)


if __name__ == "__main__":
    main()
