"""History-confidence pipeline: SHARC probe gradient -> ConfidenceBlur ->
denoiser history clamp (ConfidenceBlur.cs.hlsl; SharcUpdate.cs.hlsl:222-250;
gPrevFrameConfidence plumbing NRDSample.cpp:3860-3879)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.denoise import confidence as conf_mod
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

RES = 40  # divisible by sharc_downscale=5


def test_gradient_from_probes():
    h = conf_mod.ConfidenceHistory.create(4, 4)
    rad = jnp.ones((4, 4, 3)) * 0.5
    grad, h2 = conf_mod.gradient_from_probes(h, rad)
    assert float(grad.max()) > 0.0  # first frame: everything changed
    grad2, _ = conf_mod.gradient_from_probes(h2, rad)
    np.testing.assert_allclose(np.asarray(grad2), 0.0, atol=1e-6)


def test_confidence_map_range_and_monotonicity():
    frame = jnp.int32(3)
    lo = conf_mod.gradient_to_confidence(jnp.zeros((8, 8)), frame)
    hi = conf_mod.gradient_to_confidence(jnp.full((8, 8), 0.9), frame)
    assert 0.0 <= float(hi.min()) and float(lo.max()) <= 1.0
    assert float(lo.mean()) > float(hi.mean())  # bigger change -> less confidence


def test_atrous_blur_smooths():
    grad = jnp.zeros((16, 16)).at[8, 8].set(1.0)
    vz = jnp.ones((16, 16))
    n = jnp.zeros((16, 16, 3)).at[..., 2].set(1.0)
    out = np.asarray(conf_mod.atrous_blur(grad, vz, n, iterations=3))
    assert out[8, 8] < 1.0
    assert out[8, 10] > 0.0
    # energy roughly preserved on a flat G-buffer
    assert abs(out.sum() - 1.0) < 0.2


def _frame_setup():
    scene = procedural.cornell_box()
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    cfg = RenderConfig(
        width=RES, height=RES, rpp=1, bounce_num=1,
        tracing_mode=TracingMode.FULL_PROBABILISTIC,
        denoiser=Denoiser.RELAX, use_sharc=True, use_confidence=True,
        sharc_capacity=1 << 14,
    )
    settings = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
    return ctx, scene, cam, cfg, settings


def test_confidence_threads_through_frame():
    ctx, scene, cam, cfg, settings = _frame_setup()
    hist = frame_mod.History.create(cfg)
    assert hist.confidence is not None
    out, h2 = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
    assert h2.confidence is not None
    # probe luminance history updated after one frame
    assert float(jnp.abs(h2.confidence.probe_lum).max()) >= 0.0
    assert np.isfinite(np.asarray(out["color"])).all()
    out3, h3 = frame_mod.render_frame(ctx, scene, cam, cfg, settings, h2)
    assert np.isfinite(np.asarray(out3["color"])).all()


def test_emission_change_cuts_history():
    """A large lighting change between frames must reduce confidence (the
    reference's adaptive-accumulation trigger, NRDSample.cpp:2139-2189)."""
    import dataclasses

    ctx, scene, cam, cfg, settings = _frame_setup()
    hist = frame_mod.History.create(cfg)
    # converge two frames with the light ON
    _, hist = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
    _, hist = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)

    base_lum = np.asarray(hist.confidence.probe_lum)

    # switch the light off: the probe field changes, gradient spikes
    dark = Settings(
        sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1),
        emission_intensity=jnp.float32(0.0),
    )
    _, hist_dark = frame_mod.render_frame(ctx, scene, cam, cfg, dark, hist)
    new_lum = np.asarray(hist_dark.confidence.probe_lum)
    assert new_lum.sum() < base_lum.sum()  # light actually went off
