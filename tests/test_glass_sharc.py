"""End-to-end tests for TraceTransparent (glass) and the SHARC-integrated frame
(BASELINE config 4 coverage on a small scene)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

RES = 48


@pytest.fixture(scope="module")
def glass_setup():
    scene = procedural.cornell_box_glass()
    ctxs, scene = traversal.build_scene_contexts(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    settings = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
    return ctxs, scene, cam, settings


class TestGlass:
    def test_partition(self, glass_setup):
        ctxs, scene, _, _ = glass_setup
        assert ctxs.transparent is not None
        assert ctxs.transparent.tri_offset == ctxs.opaque.tris.count
        assert scene.num_tris == ctxs.opaque.tris.count + ctxs.transparent.tris.count

    def test_render_finite_and_glass_visible(self, glass_setup):
        ctxs, scene, cam, settings = glass_setup
        cfg = RenderConfig(
            width=RES, height=RES, rpp=1, bounce_num=2, delta_bounce_num=6,
            denoiser=Denoiser.REFERENCE, importance_samples=4,
        )
        hist = frame_mod.History.create(cfg)
        out, _ = frame_mod.render_frame(ctxs, scene, cam, cfg, settings, hist)
        c = np.asarray(out["color"])
        assert np.isfinite(c).all() and (c >= 0).all()

    def test_emissive_remap_survives_partition(self, glass_setup):
        _, scene, _, _ = glass_setup
        em = np.asarray(scene.emissive_tris)
        em = em[em >= 0]
        assert len(em) == int(scene.emissive_count)
        mats = np.asarray(scene.tris.material)[em]
        emission = np.asarray(scene.materials.emission)[mats]
        assert (emission.max(axis=-1) > 0).all()


class TestSharcFrame:
    def test_sharc_frame_runs_and_cache_fills(self):
        scene = procedural.cornell_box()
        ctx, scene = traversal.build_context(scene)
        cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
        cfg = RenderConfig(
            width=RES, height=RES, rpp=1, bounce_num=2, use_sharc=True,
            sharc_capacity=1 << 14, denoiser=Denoiser.REFERENCE,
            importance_samples=4,
        )
        settings = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
        hist = frame_mod.History.create(cfg)
        out = None
        for _ in range(3):
            out, hist = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
        c = np.asarray(out["color"])
        assert np.isfinite(c).all()
        # the cache must have been populated by the update pass
        filled = int((np.asarray(hist.sharc.keys) != 0).sum())
        assert filled > 50, filled
        resolved_count = np.asarray(hist.sharc.resolved[..., 3])
        assert (resolved_count > 0).sum() > 50

    def test_sharc_speeds_convergence_energy(self):
        # with the cache on, a 1-bounce render should pick up multi-bounce
        # energy (cache holds the propagated field) -> at least as bright
        scene = procedural.cornell_box()
        ctx, scene = traversal.build_context(scene)
        cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
        settings = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))

        def mean_energy(use_sharc):
            cfg = RenderConfig(
                width=RES, height=RES, rpp=1, bounce_num=1, use_sharc=use_sharc,
                sharc_capacity=1 << 14, denoiser=Denoiser.REFERENCE,
                importance_samples=4,
            )
            hist = frame_mod.History.create(cfg)
            for _ in range(6):
                out, hist = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
            return float(np.asarray(out["color"]).mean())

        e_off = mean_energy(False)
        e_on = mean_energy(True)
        assert e_on > e_off * 0.9
