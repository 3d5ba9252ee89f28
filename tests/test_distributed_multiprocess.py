"""True multi-process `jax.distributed` test on CPU (SURVEY section 4:
"multi-host tests on CPU meshes via jax.distributed").

Two worker processes form one 4-device global mesh (2 virtual CPU
devices each, gloo collectives) and run distributed_optimize on the
same instance; both must terminate OPTIMAL with the same solution as a
single-process solve."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)
assert jax.device_count() == 4, jax.device_count()
import numpy as np
from firstorderlp_tpu.parallel import distributed as D
from firstorderlp_tpu.generators import generate_pagerank_lp
from utils import pdhg_params, optimality_criteria

prob = generate_pagerank_lp(num_nodes=150, seed=0)
params = pdhg_params(optimality_criteria(1e-6), ruiz_iterations=10)
out = D.distributed_optimize(params, prob, n_dual=4, n_primal=1)
print(
    "RESULT", out.termination_string,
    repr(np.asarray(out.primal_solution[:5]).tolist()),
)
"""


def test_two_process_distributed_solve(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    # the axon site hook (ambient PYTHONPATH) hijacks device creation;
    # give workers a clean interpreter environment.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = REPO + os.pathsep + os.path.join(REPO, "tests")
    port = "9817"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert lines, out[-2000:]
        results.append(lines[0])
    assert "OPTIMAL" in results[0]
    assert results[0] == results[1]  # replicated identical outputs
