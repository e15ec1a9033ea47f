"""RESOLUTION_HALF checkerboard tracing + reconstruction
(Shared.hlsli:62-65; TraceOpaque.cs.hlsl:482-519 WriteResult)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.denoise import checkerboard as cb_mod
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

RES = 32


def test_resolve_fills_holes_exactly():
    h = w = 8
    cb = cb_mod.checkerboard_mask(h, w, jnp.int32(0))
    img = jnp.where(cb[..., None], 2.0, 0.0) * jnp.ones((h, w, 3))
    out = np.asarray(cb_mod.resolve(img, cb))
    # traced pixels unchanged; untraced filled with neighbor average (=2)
    np.testing.assert_allclose(out, 2.0, atol=1e-6)


def test_mask_matches_tracer_selector():
    from nrdsample_tpu.mathlib import rng

    cb = np.asarray(cb_mod.checkerboard_mask(4, 4, jnp.int32(3)))
    px = jnp.arange(4, dtype=jnp.int32)
    ref = np.asarray(rng.checkerboard(px[None, :], px[:, None], jnp.int32(3)))
    np.testing.assert_array_equal(cb, ref.astype(bool))


def test_half_mode_renders_without_holes():
    scene = procedural.cornell_box()
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    cfg = RenderConfig(
        width=RES, height=RES, rpp=1, bounce_num=2,
        tracing_mode=TracingMode.HALF, denoiser=Denoiser.RELAX,
    )
    settings = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
    hist = frame_mod.History.create(cfg)
    out, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
    img = np.asarray(out["color"]).reshape(RES, RES, 3)
    assert np.isfinite(img).all()

    # no checkerboard pattern surviving in the composed image: compare the two
    # parities of interior wall pixels - their means should be close
    cb = np.asarray(cb_mod.checkerboard_mask(RES, RES, jnp.int32(0)))
    interior = img[4:-4, 4:-4].mean(axis=-1)
    cbi = cb[4:-4, 4:-4]
    m0 = interior[cbi].mean()
    m1 = interior[~cbi].mean()
    assert abs(m0 - m1) / max(m0, m1) < 0.25


def test_half_mode_ray_budget_is_half():
    """In HALF mode path_num is rpp (one lobe per pixel) vs 2*rpp in FULL."""
    assert TracingMode.HALF != TracingMode.FULL
    # structural check on trace cfg: FULL doubles the path count
    cfg_half = RenderConfig(tracing_mode=TracingMode.HALF, rpp=1)
    cfg_full = RenderConfig(tracing_mode=TracingMode.FULL, rpp=1)
    n_half = cfg_half.rpp * (2 if cfg_half.tracing_mode == TracingMode.FULL else 1)
    n_full = cfg_full.rpp * (2 if cfg_full.tracing_mode == TracingMode.FULL else 1)
    assert n_full == 2 * n_half


def test_hitdist_reconstruct_3x3():
    """AREA_3X3 hitT reconstruction (NRDSample.cpp:548): zeros fill from valid
    3x3 neighbors; valid pixels pass through; empty neighborhoods stay zero."""
    hd = np.zeros((8, 8), np.float32)
    hd[2, 2] = 4.0
    hd[2, 4] = 8.0
    out = np.asarray(cb_mod.hitdist_reconstruct_3x3(jnp.asarray(hd)))
    # valid passes through
    assert out[2, 2] == 4.0 and out[2, 4] == 8.0
    # between the two: average of both valid neighbors
    assert out[2, 3] == 6.0
    # adjacent to only one: takes that one
    assert out[1, 1] == 4.0
    # far corner has no valid neighbor -> stays 0
    assert out[7, 7] == 0.0
