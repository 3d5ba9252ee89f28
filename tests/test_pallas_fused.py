"""Fused dense dual-step Pallas kernel (interpret mode on CPU)."""

import numpy as np
import pytest

from firstorderlp_tpu.ops.pallas_fused import TILE_M, fused_dual_step


@pytest.mark.parametrize("m,n", [(TILE_M, 128), (4 * TILE_M, 384)])
def test_fused_dual_step_matches_reference(m, n):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((m, n)).astype(np.float32) / np.sqrt(n)
    z = rng.standard_normal(n).astype(np.float32)
    y = rng.standard_normal(m).astype(np.float32)
    b = rng.standard_normal(m).astype(np.float32)
    eq = rng.integers(0, 2, m).astype(np.int32)
    sigma = 0.37

    yn, aty = fused_dual_step(a, z, y, b, eq, sigma)

    az = a @ z
    cand = y + sigma * (b - az)
    yn_ref = np.where(eq != 0, cand, np.maximum(cand, 0.0))
    aty_ref = yn_ref @ a
    np.testing.assert_allclose(np.asarray(yn), yn_ref, rtol=2e-6, atol=2e-6)
    scale = np.abs(aty_ref).max()
    np.testing.assert_allclose(
        np.asarray(aty) / scale, aty_ref / scale, rtol=0, atol=5e-6
    )
