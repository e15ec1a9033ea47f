"""Output-resolution post chain: upscaler slot, NIS sharpen, Final pass.

Reference behaviors covered (SURVEY.md §2.2): DlssBefore guide prep,
DLSS-SR slot resize (NRDSample.cpp:4284-4317), NIS sharpen (4360-4388),
Final split-screen/dither/sRGB (Final.cs.hlsl:11-63).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nrdsample_tpu.post import final, guides, nis, upscale


def test_lanczos_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(16, 24, 3).astype(np.float32))
    out = upscale.lanczos_resize(img, 16, 24)
    assert out.shape == (16, 24, 3)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_lanczos_constant_preserved():
    """Resampling a constant image must return the same constant (weights
    normalized) for both up- and down-scaling."""
    img = jnp.full((20, 20, 3), 0.7, jnp.float32)
    up = upscale.lanczos_resize(img, 37, 53)
    down = upscale.lanczos_resize(img, 7, 11)
    np.testing.assert_allclose(np.asarray(up), 0.7, atol=1e-5)
    np.testing.assert_allclose(np.asarray(down), 0.7, atol=1e-5)
    assert up.shape == (37, 53, 3)


def test_lanczos_upscale_interpolates_smooth_ramp():
    h = w = 16
    y = np.linspace(0.0, 1.0, h, dtype=np.float32)
    img = jnp.asarray(np.broadcast_to(y[:, None, None], (h, w, 1)).copy())
    out = np.asarray(upscale.lanczos_resize(img, 32, 32))
    # a linear ramp must stay monotone and close to the analytic ramp inside
    # the interior (edges are clamped)
    ramp = np.asarray(out[4:-4, 16, 0])
    assert np.all(np.diff(ramp) > -1e-4)


def test_nis_sharpen_identity_at_zero():
    img = jnp.asarray(np.random.RandomState(1).rand(12, 12, 3).astype(np.float32))
    out = nis.sharpen(img, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_nis_sharpen_increases_edge_contrast():
    img = np.full((16, 16, 3), 0.2, np.float32)
    img[:, 8:] = 0.6
    out = np.asarray(nis.sharpen(jnp.asarray(img), 1.0))
    # overshoot on the bright side of the edge, undershoot on the dark side
    assert out[8, 8, 0] >= 0.6 - 1e-6
    assert out[8, 7, 0] <= 0.2 + 1e-6
    # flat regions mostly preserved
    np.testing.assert_allclose(out[:, :4], 0.2, atol=1e-3)


def test_final_split_screen_and_srgb():
    h = w = 16
    den = jnp.full((h, w, 3), 0.25, jnp.float32)
    noisy = jnp.full((h, w, 3), 0.75, jnp.float32)
    out = np.asarray(
        final.final_pass(den, noisy=noisy, separator=0.5, dither=False)
    )
    # left half noisy, right half denoised (after sRGB transfer)
    import nrdsample_tpu.mathlib.color as color

    left = float(np.asarray(color.linear_to_srgb(jnp.float32(0.75))))
    right = float(np.asarray(color.linear_to_srgb(jnp.float32(0.25))))
    np.testing.assert_allclose(out[:, 2], left, atol=1e-5)
    np.testing.assert_allclose(out[:, -2], right, atol=1e-5)
    # divider column is NV green
    div = out[:, 8]
    np.testing.assert_allclose(
        div, np.broadcast_to(np.asarray(final.NV_GREEN), div.shape), atol=1e-5
    )


def test_final_dither_bounded():
    img = jnp.full((8, 8, 3), 0.5, jnp.float32)
    out = np.asarray(final.final_pass(img, dither=True, srgb=False))
    assert np.all(np.abs(out - 0.5) <= 0.5 / 255.0 + 1e-6)
    assert out.std() > 0.0  # dither actually applied


def test_rr_guides_contract():
    n = 64
    rs = np.random.RandomState(2)
    gb = {
        "base_color": jnp.asarray(rs.rand(n, 3).astype(np.float32)),
        "metalness": jnp.asarray(rs.rand(n).astype(np.float32)),
        "roughness": jnp.asarray(rs.rand(n).astype(np.float32)),
        "normal": jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)),
        "view_z": jnp.asarray((rs.rand(n).astype(np.float32) + 0.1) * 10.0),
        "mv": jnp.zeros((n, 3), jnp.float32),
        "spec_hitdist": jnp.asarray(rs.rand(n).astype(np.float32)),
    }
    g = guides.rr_guides(gb, near=0.1)
    assert g["depth"].shape == (n,)
    assert float(g["depth"].max()) <= 1.0 and float(g["depth"].min()) >= 0.0
    assert g["normal_roughness"].shape == (n, 4)
    # energy split: diff_albedo + spec_albedo <= ~1 per channel
    total = np.asarray(g["diff_albedo"] + g["spec_albedo"])
    assert np.all(total <= 1.0 + 1e-3)


def test_frame_display_output():
    """End-to-end: enable_post + output res upscale through render_frame."""
    from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
    from nrdsample_tpu.ops import traversal
    from nrdsample_tpu.pipeline import frame as frame_mod
    from nrdsample_tpu.scene import procedural
    from nrdsample_tpu.scene.types import look_at

    scene = procedural.cornell_box()
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    cfg = RenderConfig(
        width=32, height=32, rpp=1, bounce_num=1,
        tracing_mode=TracingMode.FULL_PROBABILISTIC,
        denoiser=Denoiser.REFERENCE,
        enable_post=True, output_width=48, output_height=48, use_nis=True,
    )
    settings = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
    history = frame_mod.History.create(cfg)
    out, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, history)
    disp = np.asarray(out["display"])
    assert disp.shape == (48, 48, 3)
    assert np.isfinite(disp).all()
    assert disp.min() >= 0.0 and disp.max() <= 1.0
