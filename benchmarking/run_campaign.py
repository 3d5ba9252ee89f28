"""Benchmark campaign: the in-repo counterpart of the reference's paper
experiments (scripts/csv/*.csv + scripts/analyze_csv_data.py).

Runs the synthetic suite (50 instances, 15 structural families -
benchmarking/synthetic_suite.py) through:

- the PDLP improvements LADDER (reference analyze_csv_data.py:100-115):
  vanilla PDHG -> +restarts -> +scaling -> +primal weight -> +adaptive
  step size -> +presolve (= PDLP), at 1e-4;
- full PDLP, vanilla PDHG and Mirror Prox at BOTH 1e-4 and 1e-8;
- the HiGHS external baseline (apples-to-apples residuals);

under the reference budget (kkt_matrix_pass_limit = 1e5, per-solve time
limit) and aggregates everything into benchmarking/campaign/ (summary
JSONs -> results.csv -> summary/curves/ladder tables) plus
docs/results.md formatted side by side with BASELINE.md.

Idempotent: per-solve JSONs are skipped when present, so an interrupted
campaign resumes where it stopped.

Usage: JAX_PLATFORMS=cpu python benchmarking/run_campaign.py
       [--out benchmarking/campaign] [--time_limit 600]
"""

import argparse
import json
import os
import subprocess
import sys
import time
from dataclasses import replace as dataclasses_replace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

import firstorderlp_tpu as folp  # noqa: E402
from firstorderlp_tpu import (  # noqa: E402
    AdaptiveStepsizeParams,
    ConstantStepsizeParams,
    MalitskyPockStepsizeParameters,
    MirrorProxParameters,
    PdhgParameters,
    RestartScheme,
    RestartToCurrentMetric,
    TerminationCriteria,
    construct_restart_parameters,
)
from firstorderlp_tpu.models.api import optimize as optimize_any  # noqa
from firstorderlp_tpu.solve_log import (  # noqa: E402
    PointType,
    SolveLog,
    solve_log_to_json,
    termination_reason_to_string,
)
import synthetic_suite  # noqa: E402


def restart_params(scheme=RestartScheme.ADAPTIVE_NORMALIZED):
    return construct_restart_parameters(
        restart_scheme=scheme,
        restart_to_current_metric=(
            RestartToCurrentMetric.GAP_OVER_DISTANCE_SQUARED
        ),
        restart_frequency_if_fixed=100,
        artificial_restart_threshold=0.5,
        sufficient_reduction_for_restart=0.1,
        necessary_reduction_for_restart=0.9,
        primal_weight_update_smoothing=0.5,
        use_approximate_localized_duality_gap=False,
    )


def criteria(tol, time_limit):
    return TerminationCriteria(
        eps_optimal_absolute=tol,
        eps_optimal_relative=tol,
        eps_primal_infeasible=1e-10,
        eps_dual_infeasible=1e-10,
        iteration_limit=2**31 - 2,
        kkt_matrix_pass_limit=1e5,
        time_sec_limit=time_limit,
    )


def pdhg_config(
    tol,
    time_limit,
    restarts=True,
    scaling=True,
    primal_weight=True,
    adaptive_step=True,
):
    """One rung of the improvements ladder (cumulative flags)."""
    return PdhgParameters(
        l_inf_ruiz_iterations=10 if scaling else 0,
        l2_norm_rescaling=False,
        pock_chambolle_alpha=1.0 if scaling else None,
        primal_importance=1.0,
        scale_invariant_initial_primal_weight=primal_weight,
        verbosity=0,
        record_iteration_stats=False,
        termination_evaluation_frequency=40,
        termination_criteria=criteria(tol, time_limit),
        restart_params=restart_params(
            RestartScheme.ADAPTIVE_NORMALIZED
            if restarts
            else RestartScheme.NO_RESTARTS
        ),
        step_size_policy_params=(
            AdaptiveStepsizeParams(
                reduction_exponent=0.3, growth_exponent=0.6
            )
            if adaptive_step
            else ConstantStepsizeParams()
        ),
        evaluations_per_dispatch=8,
    )


def mp_config(tol, time_limit):
    return MirrorProxParameters(
        l_inf_ruiz_iterations=10,
        l2_norm_rescaling=False,
        pock_chambolle_alpha=1.0,
        primal_importance=1.0,
        scale_invariant_initial_primal_weight=True,
        diagonal_scaling="l1",
        verbosity=0,
        record_iteration_stats=False,
        termination_evaluation_frequency=40,
        termination_criteria=criteria(tol, time_limit),
        restart_params=restart_params(),
        evaluations_per_dispatch=8,
    )


def build_experiments(time_limit):
    """label -> (params or ('external', solver), tolerance, presolve)."""
    exps = {}
    ladder = [
        ("pdhg_vanilla", dict(restarts=False, scaling=False,
                              primal_weight=False, adaptive_step=False),
         False),
        ("pdhg_restarts", dict(restarts=True, scaling=False,
                               primal_weight=False, adaptive_step=False),
         False),
        ("pdhg_scaling", dict(restarts=True, scaling=True,
                              primal_weight=False, adaptive_step=False),
         False),
        ("pdhg_primal_weight", dict(restarts=True, scaling=True,
                                    primal_weight=True,
                                    adaptive_step=False), False),
        ("pdhg_stepsize", dict(restarts=True, scaling=True,
                               primal_weight=True, adaptive_step=True),
         False),
        ("pdlp", dict(restarts=True, scaling=True, primal_weight=True,
                      adaptive_step=True), True),
    ]
    for label, flags, presolve in ladder:
        exps[f"{label}_1e-4"] = (
            pdhg_config(1e-4, time_limit, **flags), 1e-4, presolve
        )
    for tol, tag in ((1e-8, "1e-8"),):
        exps[f"pdlp_{tag}"] = (
            pdhg_config(tol, time_limit), tol, True
        )
        exps[f"pdhg_vanilla_{tag}"] = (
            pdhg_config(tol, time_limit, restarts=False, scaling=False,
                        primal_weight=False, adaptive_step=False),
            tol, False,
        )
        exps[f"mirror_prox_{tag}"] = (mp_config(tol, time_limit), tol,
                                      False)
    exps["mirror_prox_1e-4"] = (mp_config(1e-4, time_limit), 1e-4, False)
    # Malitsky-Pock linesearch rung (reference artifact
    # miplib_malitskypock_100k.csv, per /root/reference/
    # .MISSING_LARGE_BLOBS; ladder methodology analyze_csv_data.py:
    # 100-115). LP-only - the runner skips QP instances for it.
    mp_ls = pdhg_config(1e-4, time_limit)
    exps["malitskypock_1e-4"] = (
        dataclasses_replace(
            mp_ls,
            step_size_policy_params=MalitskyPockStepsizeParameters(
                downscaling_factor=0.7,
                breaking_factor=0.99,
                interpolation_coefficient=1.0,
            ),
        ),
        1e-4,
        True,
    )
    # Framework-addition rung (no reference counterpart): bound-width
    # column rescaling before Ruiz/PC (preprocess.bound_width_rescaling)
    # - the badly_scaled family's gap conditioning comes from planted
    # bound-width spreads the matrix equilibrators cannot see. At 1e-8
    # this rung lifts badly_scaled from 1/5 to 3/5 solved, at 13x fewer
    # passes where it certifies.
    for tol, tag in ((1e-4, "1e-4"), (1e-8, "1e-8")):
        exps[f"pdlp_bw_{tag}"] = (
            dataclasses_replace(
                pdhg_config(tol, time_limit),
                bound_width_rescaling=True,
            ),
            tol,
            True,
        )
    exps["highs_1e-8"] = (("external", "highs"), 1e-8, False)
    # SCS-class rung: matrix-free ADMM+CG (firstorderlp_tpu/baselines)
    # - the reference anchors against scs-indirect, the same operator-
    # splitting family (scripts/solve_lp_external.jl:171-184); KKT
    # passes = iters + CG iters + checks, same unit as the PDLP rows.
    exps["admm_1e-4"] = (("external", "admm"), 1e-4, False)
    return exps


def _bucket_dim(v, minimum=256, step=4):
    """Bucket grid {256, 1024, 4096, 16384}: 4x steps keep the suite to
    ~11 (m, n) buckets (vs 19 at 2x) at a median 3.9x dense-area
    padding waste - compile count dominates the campaign's fixed costs
    on the tunneled backend (per-program cost is tens of seconds and
    the persistent cache's executable loads pay tunnel costs too), so
    fewer, fatter buckets win."""
    p = minimum
    while p < v:
        p *= step
    return p


def tpu_experiments(time_limit):
    """The chip campaign: PDLP at 1e-4 and 1e-8 under the reference
    protocol budget (kkt_matrix_pass_limit=1e5, analyze_csv_data.py:65),
    solved via iterative refinement (f32 hot loop, f64-certified -
    refine.py) on shape-bucketed canonically-padded problems so XLA
    programs are shared across every instance in a (m, n) bucket."""
    exps = {}
    for tol, tag in ((1e-4, "1e-4"), (1e-8, "1e-8")):
        params = pdhg_config(tol, time_limit)
        params = dataclasses_replace(
            params,
            matrix_format="dense_onchip",
            stats_matrix_format="coo",
        )
        exps[f"pdlp_{tag}_tpu"] = (params, tol, True)
    # the bound-width rung on chip (see build_experiments' pdlp_bw note)
    exps["pdlp_bw_1e-8_tpu"] = (
        dataclasses_replace(
            exps["pdlp_1e-8_tpu"][0], bound_width_rescaling=True
        ),
        1e-8,
        True,
    )
    # Mirror Prox on chip: the second solver under the same protocol
    # (refine.py dispatches MP phase-1 sub-solves; reference bar:
    # mirror_prox.jl:623-919 held to termination.jl:33-45), at both
    # tolerances like the CPU campaign.
    for tol, tag in ((1e-4, "1e-4"), (1e-8, "1e-8")):
        exps[f"mirror_prox_{tag}_tpu"] = (
            dataclasses_replace(
                mp_config(tol, time_limit),
                matrix_format="dense_onchip",
                stats_matrix_format="coo",
            ),
            tol,
            True,
        )
    return exps


def solve_one_tpu(params, problem, presolve, instance_name, out_path):
    """One chip solve: presolve -> pad to the (m, n) power-of-two bucket
    (exact no-op padding, parallel/sharded.py pad_problem) -> certified
    iterative refinement. Returns (output, wall, compile_sec, bucket).

    The compile component is measured via jax.monitoring
    (compile_meter) and reported per instance: the reference protocol
    has no compile cost, so an artifact that silently absorbs XLA
    compiles into solve time misstates the comparison in BOTH
    directions. Wall excludes host-side ingest (rescale + layout build
    + transfer), matching the CPU campaign's optimize_any timing, but
    ingest is reported in the timing CSV."""
    from firstorderlp_tpu.compile_meter import CompileWindow
    from firstorderlp_tpu.parallel.sharded import pad_problem
    from firstorderlp_tpu.refine import (
        _prepare as prepare_problem,  # solver-dispatched (PDHG or MP)
        optimize_iterative_refinement,
        phase1_params,
    )

    if presolve:
        import copy

        problem = copy.deepcopy(problem)
        folp.presolve(problem, verbosity=0, transform_bounds=False)
    m, n = problem.constraint_matrix.shape
    bucket = (_bucket_dim(m), _bucket_dim(n))
    padded, _, _ = pad_problem(problem, bucket[0], bucket[1])
    t0 = time.time()
    with CompileWindow() as cw_ingest:
        prepared = prepare_problem(phase1_params(params), padded)
    ingest = time.time() - t0
    t0 = time.time()
    with CompileWindow() as cw:
        output, fallback = optimize_iterative_refinement(
            params, padded, prepared=prepared
        )
    wall = time.time() - t0
    stats = output.iteration_stats[-1] if output.iteration_stats else None
    log = SolveLog(
        instance_name=instance_name,
        command_line_invocation="benchmarking/run_campaign.py --tpu",
        termination_reason=output.termination_reason,
        termination_string=output.termination_string,
        iteration_count=output.iteration_count,
        # compile-amortized: XLA compiles are a one-time per-bucket cost
        # the CPU protocol has no analogue of; the split (and the
        # aggregate compile-vs-solve comparison) is in tpu_timing.csv.
        solve_time_sec=wall - cw.seconds,
        solution_stats=stats,
        solution_type=PointType.POINT_TYPE_AVERAGE_ITERATE,
    )
    with open(out_path, "w") as f:
        f.write(solve_log_to_json(log))
    return output, wall, {
        "bucket_m": bucket[0],
        "bucket_n": bucket[1],
        "m": m,
        "n": n,
        "ingest_sec": round(ingest, 3),
        "ingest_compile_sec": round(cw_ingest.seconds, 3),
        "compile_sec": round(cw.seconds, 3),
        # backend (true XLA) compile only - zero on persistent-cache
        # hits; the remainder of compile_sec is per-process Python
        # trace/lower, paid once per distinct program, cache or not.
        "compile_backend_sec": round(
            cw.backend_seconds + cw_ingest.backend_seconds, 3
        ),
        "solve_sec": round(wall - cw.seconds, 3),
        "f64_fallback": bool(fallback),
    }


def solve_one(params, problem, presolve, instance_name, out_path):
    if presolve:
        import copy

        problem = copy.deepcopy(problem)
        folp.presolve(problem, verbosity=0, transform_bounds=False)
    t0 = time.time()
    output = optimize_any(params, problem)
    wall = time.time() - t0
    stats = output.iteration_stats[-1] if output.iteration_stats else None
    log = SolveLog(
        instance_name=instance_name,
        command_line_invocation="benchmarking/run_campaign.py",
        termination_reason=output.termination_reason,
        termination_string=output.termination_string,
        iteration_count=output.iteration_count,
        solve_time_sec=wall,
        solution_stats=stats,
        solution_type=PointType.POINT_TYPE_AVERAGE_ITERATE,
    )
    with open(out_path, "w") as f:
        f.write(solve_log_to_json(log))
    return output, wall


def load_external_suite(instance_dir, instance_list=None):
    """Loads a directory of *.mps(.gz) instances - the one-command path
    from a Netlib/MIPLIB tarball dropped into the environment to the
    full campaign protocol (reference benchmarking/README.md +
    collect_netlib_benchmark.sh; instance lists benchmarking/
    *_instance_list)."""
    names = None
    if instance_list:
        with open(instance_list) as f:
            names = [
                ln.strip() for ln in f
                if ln.strip() and not ln.startswith("#")
            ]
    suite = {}
    candidates = sorted(os.listdir(instance_dir))
    for fname in candidates:
        base = fname
        for suffix in (".mps.gz", ".mps", ".qps.gz", ".qps"):
            if fname.endswith(suffix):
                base = fname[: -len(suffix)]
                break
        else:
            continue
        if names is not None and base not in names:
            continue
        suite[base] = os.path.join(instance_dir, fname)
    if names is not None:
        missing = [nm for nm in names if nm not in suite]
        if missing:
            print(f"WARNING: {len(missing)} listed instances not found: "
                  f"{missing[:5]}...", flush=True)

    def lazy(path):
        return lambda: folp.qps_reader_to_standard_form(path)

    return {name: lazy(path) for name, path in suite.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        REPO, "benchmarking", "campaign"))
    p.add_argument("--time_limit", type=float, default=600.0)
    p.add_argument("--only", default=None,
                   help="comma-separated experiment labels to run")
    p.add_argument("--instance_dir", default=None,
                   help="run the campaign over external *.mps(.gz) "
                        "instances instead of the synthetic suite")
    p.add_argument("--instance_list", default=None,
                   help="optional instance-name list file filtering "
                        "--instance_dir (reference *_instance_list "
                        "format: one name per line, # comments)")
    p.add_argument("--tpu", action="store_true",
                   help="run the chip campaign: PDLP 1e-4/1e-8 via "
                        "certified iterative refinement on shape-"
                        "bucketed padded problems (XLA programs shared "
                        "per bucket); writes tpu_timing.csv with the "
                        "per-instance compile/solve split")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    inst_dir = os.path.join(args.out, "instances")
    os.makedirs(inst_dir, exist_ok=True)
    if args.instance_dir:
        lazy_suite = load_external_suite(
            args.instance_dir, args.instance_list
        )
        suite = {name: load() for name, load in lazy_suite.items()}
    else:
        suite = synthetic_suite.build_suite(seed=0)
        # persist the corpus for reproducibility / external baselines
        from firstorderlp_tpu.io.mps_writer import write_mps

        for name, prob in suite.items():
            path = os.path.join(inst_dir, f"{name}.mps.gz")
            if not os.path.exists(path):
                write_mps(prob, path)

    if args.tpu:
        exps = tpu_experiments(args.time_limit)
        # bucket-major order: every instance of a bucket runs on the
        # already-compiled programs of the bucket's first instance.
        suite = dict(
            sorted(
                suite.items(),
                key=lambda kv: (
                    _bucket_dim(kv[1].constraint_matrix.shape[0]),
                    _bucket_dim(kv[1].constraint_matrix.shape[1]),
                    kv[0],
                ),
            )
        )
    else:
        exps = build_experiments(args.time_limit)
    if args.only:
        keep = set(args.only.split(","))
        exps = {k: v for k, v in exps.items() if k in keep}
    datasets = []
    tpu_rows = []
    timing_path = os.path.join(args.out, "tpu_timing.csv")
    if args.tpu and os.path.exists(timing_path):
        # resume: keep rows of instances whose summaries already exist
        # (the per-solve rewrite below makes the CSV kill-safe)
        import csv as _csv

        with open(timing_path, newline="") as f:
            for row in _csv.DictReader(f):
                for key in row:
                    if key not in ("experiment", "instance"):
                        try:
                            row[key] = (
                                row[key] == "True"
                                if row[key] in ("True", "False")
                                else float(row[key])
                            )
                        except ValueError:
                            pass
                tpu_rows.append(row)

    def write_tpu_timing():
        import csv as _csv

        # dedupe by (experiment, instance), last solve wins (a resumed
        # re-measure replaces the stale row)
        dedup = {}
        for r in tpu_rows:
            dedup[(r["experiment"], r["instance"])] = r
        rows = list(dedup.values())
        with open(timing_path, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    for label, (params, tol, presolve) in exps.items():
        logs_dir = os.path.join(args.out, "logs", label)
        os.makedirs(logs_dir, exist_ok=True)
        datasets.append(
            {
                "config": {"experiment_label": label},
                "logs_directory": logs_dir,
            }
        )
        for name, problem in suite.items():
            out_path = os.path.join(logs_dir, f"{name}_summary.json")
            if os.path.exists(out_path):
                continue
            is_qp = problem.objective_matrix.nnz > 0
            if is_qp and (
                label.startswith("malitskypock")
                or (isinstance(params, tuple) and params[0] == "external")
            ):
                # Malitsky-Pock linesearch and the external LP driver
                # are LP-only (reference pdhg.jl:560-565,
                # solve_lp_external.jl:46-49).
                continue
            t0 = time.time()
            if isinstance(params, tuple) and params[0] == "external":
                mps_path = os.path.join(inst_dir, f"{name}.mps.gz")
                if args.instance_dir and not os.path.exists(mps_path):
                    for suffix in (".mps.gz", ".mps", ".qps.gz", ".qps"):
                        cand = os.path.join(
                            args.instance_dir, f"{name}{suffix}"
                        )
                        if os.path.exists(cand):
                            mps_path = cand
                            break
                rc = subprocess.run(
                    [
                        sys.executable,
                        os.path.join(REPO, "cli", "solve_lp_external.py"),
                        "--solver", params[1],
                        "--output_dir", logs_dir,
                        "--instance_path", mps_path,
                        "--tolerance", str(tol),
                        "--time_sec_limit", str(args.time_limit),
                    ],
                    capture_output=True, text=True,
                )
                status = "ok" if rc.returncode == 0 else "FAIL"
                print(f"[{label}] {name}: external {status} "
                      f"({time.time()-t0:.1f}s)", flush=True)
                continue
            try:
                if args.tpu:
                    output, wall, extra = solve_one_tpu(
                        params, problem, presolve, name, out_path
                    )
                    tpu_rows.append(
                        {"experiment": label, "instance": name, **extra}
                    )
                    write_tpu_timing()
                    print(
                        f"[{label}] {name}: "
                        f"{output.termination_string} "
                        f"iters={output.iteration_count} "
                        f"bucket={extra['bucket_m']}x"
                        f"{extra['bucket_n']} "
                        f"solve={extra['solve_sec']:.1f}s "
                        f"compile={extra['compile_sec']:.1f}s "
                        f"ingest={extra['ingest_sec']:.1f}s",
                        flush=True,
                    )
                else:
                    output, wall = solve_one(
                        params, problem, presolve, name, out_path
                    )
                    print(
                        f"[{label}] {name}: "
                        f"{output.termination_string} "
                        f"iters={output.iteration_count} {wall:.1f}s",
                        flush=True,
                    )
            except Exception as exc:  # record the failure, keep going
                print(f"[{label}] {name}: ERROR {exc}", flush=True)

    if args.tpu and tpu_rows:
        write_tpu_timing()
        agg_compile = sum(
            r["compile_sec"] + r["ingest_compile_sec"] for r in tpu_rows
        )
        agg_backend = sum(r["compile_backend_sec"] for r in tpu_rows)
        agg_solve = sum(r["solve_sec"] for r in tpu_rows)
        agg_ingest = sum(
            r["ingest_sec"] - r["ingest_compile_sec"] for r in tpu_rows
        )
        n_buckets = len(
            {(r["bucket_m"], r["bucket_n"]) for r in tpu_rows}
        )
        print(
            f"TPU campaign: {len(tpu_rows)} solves over {n_buckets} "
            f"shape buckets; aggregate solve {agg_solve:.1f}s, "
            f"aggregate XLA compile {agg_compile:.1f}s (backend "
            f"{agg_backend:.1f}s, rest is per-process trace/lower), "
            f"aggregate ingest {agg_ingest:.1f}s -> backend compile "
            f"{'<' if agg_backend < agg_solve else '>='} solve",
            flush=True,
        )

    # Aggregate over EVERY experiment with logs in --out, not just the
    # ones this invocation ran: an --only run must not clobber the
    # combined results.csv with a single-experiment layout.
    logs_root = os.path.join(args.out, "logs")
    if os.path.isdir(logs_root):
        seen = {d["config"]["experiment_label"] for d in datasets}
        for label in sorted(os.listdir(logs_root)):
            logs_dir = os.path.join(logs_root, label)
            if label not in seen and os.path.isdir(logs_dir):
                datasets.append(
                    {
                        "config": {"experiment_label": label},
                        "logs_directory": logs_dir,
                    }
                )
    layout = {"datasets": datasets, "config_labels": ["experiment_label"]}
    layout_path = os.path.join(args.out, "layout.json")
    with open(layout_path, "w") as f:
        json.dump(layout, f, indent=1)
    csv_path = os.path.join(args.out, "results.csv")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "process_json_to_csv.py"),
         layout_path, csv_path],
        check=True,
    )
    with open(os.path.join(args.out, "summary.csv"), "w") as f:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "cli", "analyze_results.py"),
             csv_path, "--curves", os.path.join(args.out, "curves.csv"),
             "--ladder", os.path.join(args.out, "ladder.csv"),
             "--per_dataset", os.path.join(args.out, "per_dataset.csv")],
            check=True, stdout=f,
        )
    if not args.tpu:
        # campaign_report renders docs/results.md from the FULL CPU
        # campaign; a TPU run covers only the pdlp experiments and must
        # not clobber it (its section is maintained by hand from
        # tpu_timing.csv + summary.csv).
        subprocess.run(
            [sys.executable, os.path.join(
                REPO, "benchmarking", "campaign_report.py"), args.out],
            check=True,
        )
    print(f"campaign complete -> {args.out}")


if __name__ == "__main__":
    main()
