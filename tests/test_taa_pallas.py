"""Fused Pallas TAA tail == taa.resolve_tail (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu import config as cfgmod
from nrdsample_tpu.denoise import taa, taa_pallas


def _planes(h=72, w=96, seed=0):
    rs = np.random.RandomState(seed)
    f32 = np.float32
    cur = jnp.asarray(rs.rand(h, w, 3).astype(f32) * 1.5)
    prev = jnp.asarray(rs.rand(h, w, 3).astype(f32) * 1.5)
    mv_d = jnp.asarray((rs.rand(h, w, 2).astype(f32) * 2 - 1) * 3.0)
    wide = jnp.asarray((rs.rand(h, w) > 0.7).astype(f32))
    reset_mix = jnp.asarray((rs.rand(h, w) > 0.9).astype(f32))
    return cur, prev, mv_d, wide, reset_mix


@pytest.mark.parametrize("use_wide", [True, False])
def test_matches_xla(use_wide):
    cur, prev, mv_d, wide, reset_mix = _planes()
    wf = wide if use_wide else None
    ref = taa.resolve_tail(cur, prev, mv_d, wf, reset_mix,
                           cfgmod.TAA_SIGMA_SCALE, 0.1)
    got = taa_pallas.taa_resolve_pallas(cur, prev, mv_d, wf, reset_mix,
                                        cfgmod.TAA_SIGMA_SCALE, 0.1,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_offscreen_forces_full_mix():
    """Pixels whose dilated velocity lands offscreen must take cur wholesale."""
    cur, prev, mv_d, wide, reset_mix = _planes(seed=4)
    big = mv_d.at[..., 0].set(500.0)
    got = taa_pallas.taa_resolve_pallas(
        cur, prev, big, None, jnp.zeros_like(reset_mix),
        cfgmod.TAA_SIGMA_SCALE, 0.1, interpret=True)
    ref = taa.resolve_tail(cur, prev, big, None, jnp.zeros_like(reset_mix),
                           cfgmod.TAA_SIGMA_SCALE, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
    # mix == 1 everywhere: out == cur up to one fma of round-off
    np.testing.assert_allclose(np.asarray(got), np.asarray(cur),
                               rtol=1e-3, atol=1e-3)


def test_apply_cpu_path_unchanged():
    """taa.apply off-TPU routes through resolve_tail; full-step smoke with
    history + reset semantics."""
    h = w = 48
    rs = np.random.RandomState(1)
    cur = jnp.asarray(rs.rand(h, w, 3).astype(np.float32))
    mv = jnp.zeros((h, w, 3), jnp.float32)
    vz = jnp.ones((h, w), jnp.float32)
    hist = taa.TaaHistory.create(h, w)
    out, hist2 = taa.apply(hist, cur, mv, vz)
    # first frame: history invalid -> out == cur
    np.testing.assert_allclose(np.asarray(out), np.asarray(cur), rtol=1e-6)
    out2, _ = taa.apply(hist2, cur * 0.5, mv, vz)
    assert np.isfinite(np.asarray(out2)).all()
    assert not np.allclose(np.asarray(out2), np.asarray(cur * 0.5))
