"""Pallas à-trous chain == the XLA reference iteration (interpret mode).

The kernel (denoise/atrous_pallas.py) must be a bit-near drop-in for
relax.atrous_iteration at every dilation step, including image edges.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.denoise import atrous_pallas, relax


def _planes(h=72, w=96, seed=0):
    rs = np.random.RandomState(seed)
    illum = jnp.asarray(rs.rand(h, w, 3).astype(np.float32) * 3.0)
    var = jnp.asarray(rs.rand(h, w).astype(np.float32) * 0.2)
    vz = jnp.asarray((1.0 + rs.rand(h, w) * 5.0).astype(np.float32))
    n = rs.randn(h, w, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    # make normals mostly-smooth (realistic): blend toward +z
    n = n * 0.3 + np.array([0, 0, 1.0], np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return illum, var, vz, jnp.asarray(n)


@pytest.mark.parametrize("step", [1, 2, 4, 8, 16])
def test_iteration_matches_xla(step):
    illum, var, vz, n = _planes()
    s = relax.RelaxSettings()
    ref_i, ref_v = relax.atrous_iteration(illum, var, vz, n, step, s)
    got_i, got_v = atrous_pallas.atrous_iteration_pallas(
        illum, var, vz, n, step, s, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=2e-5, atol=2e-5)


def test_chain_matches_xla_scan():
    """Full 5-iteration chain vs relax.denoise's scan body semantics."""
    illum, var, vz, n = _planes(seed=3)
    s = relax.RelaxSettings()
    out_ref, var_ref = illum, var
    first_ref = None
    for i in range(s.atrous_iterations):
        out_ref, var_ref = relax.atrous_iteration(
            out_ref, var_ref, vz, n, 1 << i, s
        )
        if i == 0:
            first_ref = out_ref
    out, first = atrous_pallas.atrous_chain(illum, var, vz, n, s,
                                            interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(first), np.asarray(first_ref),
                               rtol=2e-5, atol=2e-5)


def test_odd_sizes():
    """Non-multiple-of-band heights and non-128 widths pad correctly."""
    illum, var, vz, n = _planes(h=37, w=51, seed=5)
    s = relax.RelaxSettings()
    ref_i, ref_v = relax.atrous_iteration(illum, var, vz, n, 4, s)
    got_i, got_v = atrous_pallas.atrous_iteration_pallas(
        illum, var, vz, n, 4, s, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               rtol=2e-5, atol=2e-5)
