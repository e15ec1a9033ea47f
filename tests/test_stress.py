"""Stress-test fault injection + sanitization (SURVEY.md §4.4 parity).

The reference's contract: with GARBAGE written outside the DRS rect /
denoising range, the denoiser stack must still produce finite output inside
the rect (USE_DRS_STRESS_TEST / USE_INF_STRESS_TEST, Shared.hlsli:28-45).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.render import stress
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

RES = 32


def _setup(**cfg_kw):
    scene = procedural.cornell_box()
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    cfg = RenderConfig(
        width=RES, height=RES, rpp=1, bounce_num=1,
        tracing_mode=TracingMode.FULL_PROBABILISTIC,
        denoiser=Denoiser.RELAX, **cfg_kw,
    )
    settings = Settings(
        sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1),
        resolution_scale=jnp.float32(0.75),
    )
    return ctx, scene, cam, cfg, settings


def test_rect_mask():
    cfg = RenderConfig(width=8, height=8)
    s = Settings(resolution_scale=jnp.float32(0.5))
    m = np.asarray(stress.rect_mask(cfg, s, jnp.arange(64, dtype=jnp.int32)))
    m = m.reshape(8, 8)
    assert m[:4, :4].all()
    assert not m[4:].any() and not m[:, 4:].any()


def test_drs_garbage_contained_by_sanitization():
    """GARBAGE outside the rect + sanitization -> finite everywhere, and
    in-rect pixels unaffected relative to a clean render."""
    ctx, scene, cam, cfg, settings = _setup(
        use_drs_stress_test=True, use_sanitization=True,
    )
    hist = frame_mod.History.create(cfg)
    out, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
    img = np.asarray(out["color"]).reshape(RES, RES, 3)
    assert np.isfinite(img).all(), "garbage leaked through sanitization"

    # reference: same sanitization (same rect zeroing) but NO garbage written.
    # If sanitization fully neutralizes the injection, outputs are identical.
    ctx2, scene2, cam2, cfg2, _ = _setup(use_sanitization=True)
    hist2 = frame_mod.History.create(cfg2)
    out2, _ = frame_mod.render_frame(ctx2, scene2, cam2, cfg2, settings, hist2)
    img2 = np.asarray(out2["color"]).reshape(RES, RES, 3)
    np.testing.assert_allclose(img, img2, atol=1e-5)


def test_garbage_without_sanitization_propagates():
    """Sanity check that the injection actually happens: without sanitization
    the out-of-rect output contains non-finite values."""
    ctx, scene, cam, cfg, settings = _setup(use_drs_stress_test=True)
    hist = frame_mod.History.create(cfg)
    out, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
    img = np.asarray(out["color"]).reshape(RES, RES, 3)
    assert not np.isfinite(img).all()


def test_firefly_injection_and_magnitude():
    from nrdsample_tpu.mathlib import rng

    ctx, scene, cam, cfg, settings = _setup(use_firefly_test=True)
    settings = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
    hist = frame_mod.History.create(cfg)
    out, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
    d = np.asarray(out["gbuffer"]["diff_radiance"])  # pre-denoise signal
    assert np.isfinite(d).all()

    # clean render with the identical seed path
    ctx2, scene2, cam2, cfg2, _ = _setup()
    out2, _ = frame_mod.render_frame(
        ctx2, scene2, cam2, cfg2, settings, frame_mod.History.create(cfg2)
    )
    d2 = np.asarray(out2["gbuffer"]["diff_radiance"])

    u = np.asarray(rng.uniform1(jnp.arange(RES * RES, dtype=jnp.int32),
                                jnp.int32(0), 555))
    spike = u < 0.004
    # non-spiked pixels identical; spiked pixels scaled by exactly 1e4
    np.testing.assert_allclose(d[~spike], d2[~spike], atol=1e-6)
    np.testing.assert_allclose(d[spike], d2[spike] * 10000.0, rtol=1e-5)
    # denoised output must remain finite
    assert np.isfinite(np.asarray(out["diff_radiance"])).all()


def test_is_valid_radiance():
    c = jnp.asarray([[1.0, 2.0, 3.0], [np.nan, 0.0, 0.0],
                     [np.inf, 1.0, 1.0], [-1.0, 0.0, 0.0]])
    v = np.asarray(stress.is_valid_radiance(c))
    assert v.tolist() == [True, False, False, False]


def test_material_id_stripes():
    ctx, scene, cam, cfg, settings = _setup(use_material_id_test=True)
    hist = frame_mod.History.create(cfg)
    out, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
    mid = np.asarray(out["gbuffer"]["material_id"]).reshape(RES, RES)
    assert set(np.unique(mid)) <= {0.0, 1.0}
    assert (mid[0] != mid[8]).all()  # stripes alternate every 8 rows
