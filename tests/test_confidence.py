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
    probes = {"radiance": jnp.ones((4, 4, 3)) * 0.5, "view_z": jnp.ones((4, 4))}
    grad, h2 = conf_mod.gradient_from_probes(h, probes)
    assert float(grad.max()) > 0.0  # first frame: everything changed
    grad2, _ = conf_mod.gradient_from_probes(h2, probes)
    np.testing.assert_allclose(np.asarray(grad2), 0.0, atol=1e-6)


def test_prev_retrace_isolates_lighting_change():
    """SharcUpdate.cs.hlsl:222-250 parity: on a STATIC scene the prev-frame
    retrace replays the exact paths, so the gradient is ~0 even though the
    re-jittered probe field differs frame-to-frame (sampling noise); a sun
    move then produces a real gradient."""
    import dataclasses

    from nrdsample_tpu.render import sharc_update
    from nrdsample_tpu.ops import sharc as sharc_mod
    from nrdsample_tpu.mathlib import color

    ctx, scene, cam, cfg, settings = _frame_setup()
    settings = dataclasses.replace(settings, disable_shadows=jnp.int32(0),
                                   sun_elevation=jnp.float32(45.0))
    state = sharc_mod.SharcState.create(cfg.sharc_capacity, cfg.dtype)

    _, probes0 = sharc_update.sharc_update_pass(
        ctx, scene, cam, cfg, settings, jnp.int32(0), state
    )
    hist = conf_mod.ConfidenceHistory(
        probe_lum=color.luminance(probes0["radiance"]),
        view_z=probes0["view_z"],
    )
    _, probes1 = sharc_update.sharc_update_pass(
        ctx, scene, cam, cfg, settings, jnp.int32(1), state
    )
    grad_static, _ = conf_mod.gradient_from_probes(hist, probes1)
    # the naive re-jittered diff IS noisy on this scene...
    naive = np.abs(np.asarray(color.luminance(probes1["radiance"]))
                   - np.asarray(hist.probe_lum))
    assert naive.max() > 0.05, "scene too clean to demonstrate the mechanism"
    # ...but the retrace gradient cancels the sampling noise exactly
    assert float(jnp.abs(grad_static).max()) < 1e-4

    # now MOVE THE SUN between frame 0 and frame 1: gradient must fire
    moved = dataclasses.replace(settings, sun_elevation=jnp.float32(25.0))
    _, probes1m = sharc_update.sharc_update_pass(
        ctx, scene, cam, cfg, moved, jnp.int32(1), state
    )
    grad_moved, _ = conf_mod.gradient_from_probes(hist, probes1m)
    assert float(jnp.abs(grad_moved).max()) > 0.02


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
