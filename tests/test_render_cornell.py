"""End-to-end render tests on CornellBox (BASELINE config 1) — the golden-image
+ furnace layer of the test pyramid (SURVEY.md §4 implications (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

RES = 64  # small for CPU CI; bench uses 256


def _setup(furnace=False, bounces=1, rpp=1):
    scene = procedural.cornell_box(furnace=furnace)
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    cfg = RenderConfig(
        width=RES, height=RES, rpp=rpp, bounce_num=bounces,
        tracing_mode=TracingMode.FULL_PROBABILISTIC,
        denoiser=Denoiser.REFERENCE, use_white_furnace=furnace,
    )
    settings = Settings(
        sun_elevation=jnp.float32(-30.0),  # sun below horizon: interior lighting only
        disable_shadows=jnp.int32(1),
    )
    return ctx, scene, cam, cfg, settings


class TestCornell:
    def test_render_smoke_and_finite(self):
        ctx, scene, cam, cfg, settings = _setup()
        hist = frame_mod.History.create(cfg)
        out, hist = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
        color = np.asarray(out["color"])
        assert color.shape == (RES * RES, 3)
        assert np.isfinite(color).all()
        assert (color >= 0).all()
        assert color.max() > 0  # the light is visible somewhere
        assert int(hist.frame_index) == 1

    def test_primary_hits_cover_screen(self):
        ctx, scene, cam, cfg, settings = _setup()
        hist = frame_mod.History.create(cfg)
        out, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
        vz = np.asarray(out["view_z"]).reshape(RES, RES)
        # camera looks into a closed box: all rays must hit geometry
        assert (vz < 1e4).mean() > 0.99

    def test_accumulation_reduces_variance(self):
        ctx, scene, cam, cfg, settings = _setup(bounces=2)
        img1, hist = frame_mod.render_converged(ctx, scene, cam, cfg, settings, 2)
        img2, hist = frame_mod.render_converged(ctx, scene, cam, cfg, settings, 14, hist)
        # pixelwise noise of a later-accumulated image vs a converged-ish target
        # must shrink: compare block variance of luminance differences
        l1 = np.asarray(img1).mean(-1).reshape(RES, RES)
        l2 = np.asarray(img2).mean(-1).reshape(RES, RES)
        # high-frequency noise estimate: laplacian energy
        def hf(x):
            return np.abs(np.diff(x, axis=0)).mean() + np.abs(np.diff(x, axis=1)).mean()
        assert hf(l2) < hf(l1)

    def test_deterministic_replay(self):
        # same (frame, seed, settings) -> identical output (failure-recovery
        # story, SURVEY.md §5.3)
        ctx, scene, cam, cfg, settings = _setup()
        h0 = frame_mod.History.create(cfg)
        a, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, h0)
        h1 = frame_mod.History.create(cfg)
        b, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, h1)
        np.testing.assert_array_equal(np.asarray(a["color"]), np.asarray(b["color"]))


class TestWhiteFurnace:
    def test_furnace_energy_conservation(self):
        """USE_WHITE_FURNACE (Shared.hlsli:42): albedo=1, sky=1, sun=0 -> the
        converged image must be ~1 everywhere (energy preserved)."""
        scene = procedural.cornell_box(furnace=True)
        # furnace needs an *open* environment: use just the two boxes so rays
        # escape to the white sky
        ctx, scene = traversal.build_context(scene)
        cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
        cfg = RenderConfig(
            width=32, height=32, rpp=2, bounce_num=6,
            tracing_mode=TracingMode.FULL_PROBABILISTIC,
            denoiser=Denoiser.REFERENCE, use_white_furnace=True,
        )
        settings = Settings(disable_shadows=jnp.int32(1))
        img, _ = frame_mod.render_converged(ctx, scene, cam, cfg, settings, 48)
        mean = float(np.asarray(img).mean())
        # Lambertian with albedo 1 in a uniform furnace: radiance == 1. Paths
        # truncated at bounce_num lose a little energy inside the box.
        assert 0.75 < mean < 1.1, f"furnace mean {mean}"
