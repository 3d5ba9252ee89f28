"""Fleet runner: solves every *.mps(.gz) in --instance_dir with
cli/solve_qp.py (or the external baseline driver) and collects the JSON
logs for process_json_to_csv.py / analyze_results.py.

Reference workflow: the per-instance solve loops in benchmarking/README.md
driving scripts/solve_qp.jl with the PDLP defaults.

Usage:
  python run_benchmark.py --instance_dir prepped/ --output_dir logs/ \
      --method pdhg [any solve_qp.py flag ...]
  python run_benchmark.py --instance_dir prepped/ --output_dir logs/ \
      --external highs-ipm
"""

import argparse
import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--instance_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument(
        "--external",
        default=None,
        help="use cli/solve_lp_external.py with this solver instead",
    )
    args, passthrough = parser.parse_known_args()

    instances = sorted(
        glob.glob(os.path.join(args.instance_dir, "*.mps"))
        + glob.glob(os.path.join(args.instance_dir, "*.mps.gz"))
        + glob.glob(os.path.join(args.instance_dir, "*.qps"))
        + glob.glob(os.path.join(args.instance_dir, "*.qps.gz"))
    )
    if not instances:
        raise SystemExit(f"no instances found in {args.instance_dir}")
    os.makedirs(args.output_dir, exist_ok=True)

    failures = 0
    for i, path in enumerate(instances):
        name = os.path.basename(path)
        print(f"[{i + 1}/{len(instances)}] {name}", flush=True)
        if args.external:
            cmd = [
                sys.executable,
                os.path.join(REPO, "cli", "solve_lp_external.py"),
                "--solver", args.external,
                "--output_dir", args.output_dir,
                "--instance_path", path,
            ] + passthrough
        else:
            cmd = [
                sys.executable,
                os.path.join(REPO, "cli", "solve_qp.py"),
                "--output_dir", args.output_dir,
                "--instance_path", path,
            ] + passthrough
        result = subprocess.run(cmd)
        if result.returncode != 0:
            failures += 1
            print(f"  FAILED (rc={result.returncode})", flush=True)
    print(f"done: {len(instances) - failures}/{len(instances)} solved runs")
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
