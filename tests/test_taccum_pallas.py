"""Fused Pallas taccum == the XLA reference block (interpret mode).

The kernel (denoise/taccum_pallas.py) must reproduce
anti_firefly -> temporal_accumulate -> estimate_variance exactly, including
clamp-to-edge behavior at image borders and the disocclusion/confidence
plumbing, for displacements inside the stencil bound.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.denoise import relax, taccum_pallas


def _planes(h=72, w=96, seed=0, mv_scale=0.8):
    rs = np.random.RandomState(seed)
    f32 = np.float32
    illum = jnp.asarray(rs.rand(h, w, 3).astype(f32) * 3.0)
    vz = jnp.asarray((1.0 + rs.rand(h, w) * 5.0).astype(f32))
    n = rs.randn(h, w, 3).astype(f32)
    n = n * 0.3 + np.array([0, 0, 1.0], f32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    mv = jnp.asarray((rs.rand(h, w, 3).astype(f32) * 2 - 1) * mv_scale)
    hist = relax.RelaxHistory(
        illum=jnp.asarray(rs.rand(h, w, 3).astype(f32) * 2.0),
        moments=jnp.asarray(rs.rand(h, w, 2).astype(f32)),
        view_z=vz * (1.0 + jnp.asarray(rs.randn(h, w).astype(f32)) * 0.005),
        normal=jnp.asarray(n),
        frames=jnp.asarray((rs.rand(h, w) * 20).astype(f32)),
    )
    return hist, illum, vz, jnp.asarray(n), mv


def _reference(hist, illum, vz, nrm, mv, s, conf):
    return taccum_pallas._reference_impl(
        hist.illum, hist.moments, hist.view_z, hist.normal, hist.frames,
        illum, vz, nrm, mv, conf, s)


@pytest.mark.parametrize("mv_scale", [0.0, 0.8, 2.4])
def test_matches_xla(mv_scale):
    hist, illum, vz, nrm, mv = _planes(mv_scale=mv_scale)
    s = relax.RelaxSettings()
    conf = jnp.ones(vz.shape, jnp.float32)
    ref = _reference(hist, illum, vz, nrm, mv, s, conf)
    got = taccum_pallas.taccum_variance_pallas(
        hist, illum, vz, nrm, mv, s, conf, interpret=True)
    for g, r, name in zip(got, ref, ["illum", "moments", "frames", "var"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5,
            err_msg=name)


def test_confidence_and_no_firefly():
    hist, illum, vz, nrm, mv = _planes(seed=5)
    s = relax.RelaxSettings(enable_anti_firefly=False,
                            max_accumulated_frames=12)
    rs = np.random.RandomState(9)
    conf = jnp.asarray(rs.rand(*vz.shape).astype(np.float32))
    ref = _reference(hist, illum, vz, nrm, mv, s, conf)
    got = taccum_pallas.taccum_variance_pallas(
        hist, illum, vz, nrm, mv, s, conf, interpret=True)
    for g, r, name in zip(got, ref, ["illum", "moments", "frames", "var"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-5, atol=2e-5,
            err_msg=name)


def test_auto_dispatch_fallback_on_fast_motion():
    """Above the displacement bound the cond must take the XLA branch and
    still be correct (it IS the reference)."""
    hist, illum, vz, nrm, mv = _planes(seed=2, mv_scale=6.0)
    s = relax.RelaxSettings()
    ref = _reference(hist, illum, vz, nrm, mv, s, jnp.ones(vz.shape))
    got = taccum_pallas.taccum_fused_auto(hist, illum, vz, nrm, mv, s)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_reset_zeroes_history():
    hist, illum, vz, nrm, mv = _planes(seed=3, mv_scale=0.5)
    s = relax.RelaxSettings()
    acc, m, fr, _ = taccum_pallas.taccum_fused_auto(
        hist, illum, vz, nrm, mv, s, reset=jnp.bool_(True))
    np.testing.assert_allclose(np.asarray(fr), 1.0)
    np.testing.assert_allclose(np.asarray(acc), np.asarray(
        relax.common.anti_firefly(illum)), rtol=1e-6)
