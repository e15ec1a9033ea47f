"""Round-3 parity items: forced materials (RaytracingShared.hlsli:497-515)
and adaptive accumulation (NRDSample.cpp:2139-2189)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrdsample_tpu.config import (
    Denoiser, ForcedMaterial, RenderConfig, Settings, TracingMode,
)
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import adaptive
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.render import gbuffer
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at


@pytest.fixture(scope="module")
def cornell():
    scene = procedural.cornell_box()
    ctx, scene = traversal.build_context(scene)
    return ctx, scene


class TestForcedMaterial:
    def _decode(self, cornell, fm):
        ctx, scene = cornell
        n = 64
        o = jnp.broadcast_to(jnp.asarray([0.0, -3.2, 1.0]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
        hit = traversal.closest_hit(ctx, o, d)
        return gbuffer.decode_hit(
            scene, hit, o, d, jnp.asarray([0.0, 0.0, 1.0]), jnp.float32(5e-3),
            forced_material=jnp.int32(fm),
        )

    def test_gypsum(self, cornell):
        p = self._decode(cornell, ForcedMaterial.GYPSUM)
        np.testing.assert_allclose(np.asarray(p["base_color"]), 0.5)
        np.testing.assert_allclose(np.asarray(p["roughness"]), 1.0)
        np.testing.assert_allclose(np.asarray(p["metalness"]), 0.0)

    def test_cobalt(self, cornell):
        p0 = self._decode(cornell, ForcedMaterial.NONE)
        p = self._decode(cornell, ForcedMaterial.COBALT)
        np.testing.assert_allclose(
            np.asarray(p["base_color"][0]), [0.672411, 0.637331, 0.585456],
            rtol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(p["metalness"]), 1.0)
        # cobalt roughness encodes the ORIGINAL base color (cbrt of product)
        bc = np.asarray(p0["base_color"][0])
        np.testing.assert_allclose(
            float(p["roughness"][0]), np.cbrt(np.clip(bc.prod(), 0, 1)),
            rtol=1e-5,
        )

    def test_none_is_identity(self, cornell):
        p0 = self._decode(cornell, ForcedMaterial.NONE)
        ctx, scene = cornell
        n = 64
        o = jnp.broadcast_to(jnp.asarray([0.0, -3.2, 1.0]), (n, 3))
        d = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (n, 3))
        hit = traversal.closest_hit(ctx, o, d)
        p_nofm = gbuffer.decode_hit(
            scene, hit, o, d, jnp.asarray([0.0, 0.0, 1.0]), jnp.float32(5e-3),
        )
        np.testing.assert_array_equal(
            np.asarray(p0["base_color"]), np.asarray(p_nofm["base_color"])
        )

    def test_forced_material_changes_render(self, cornell):
        """End-to-end: the Settings field reaches the frame (every hit decode)."""
        ctx, scene = cornell
        cfg = RenderConfig(width=32, height=32, rpp=1, bounce_num=1,
                           tracing_mode=TracingMode.FULL_PROBABILISTIC,
                           denoiser=Denoiser.REFERENCE)
        cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0],
                      fov_y_deg=39.0)
        frame_fn = frame_mod.make_jitted_frame(ctx, cfg)
        outs = {}
        for fm in (ForcedMaterial.NONE, ForcedMaterial.GYPSUM):
            settings = Settings(sun_elevation=jnp.float32(-30.0),
                                disable_shadows=jnp.int32(1),
                                forced_material=jnp.int32(fm))
            hist = frame_mod.History.create(cfg)
            out, _ = frame_fn(scene, cam, settings, hist)
            outs[fm] = np.asarray(out["color"])
            assert np.isfinite(outs[fm]).all()
        assert np.abs(outs[ForcedMaterial.NONE]
                      - outs[ForcedMaterial.GYPSUM]).max() > 1e-4


class TestAdaptiveAccumulation:
    def test_frames_track_fps(self):
        # 121 fps cap: 8.26 ms -> 0.5 s * 121 = 60 (hits MAX_HISTORY cap too)
        assert adaptive.max_accumulated_frames(8.26) == 60
        # 30 fps -> 15 frames of history = 0.5 s
        assert adaptive.max_accumulated_frames(1000.0 / 30.0) == 15
        # slow frames floor at 1
        assert adaptive.max_accumulated_frames(5000.0) == 1
        # SHARC boost shortens the window
        assert adaptive.max_accumulated_frames(
            1000.0 / 30.0, boost_with_sharc=True
        ) == 10

    def test_emission_change_soft_resets(self):
        s_prev = Settings(emission_intensity=jnp.float32(1.0))
        s_now = Settings(emission_intensity=jnp.float32(8.0))
        upd = adaptive.update(s_now, s_prev, smoothed_frame_ms=16.7)
        steady = adaptive.update(s_now, s_now, smoothed_frame_ms=16.7)
        assert int(upd.max_accumulated_frame_num) < int(
            steady.max_accumulated_frame_num
        )
        assert int(upd.max_accumulated_frame_num) >= 1

    def test_cap_reaches_denoiser(self, cornell):
        """max_accumulated_frame_num=1 must kill temporal accumulation: two
        identical RELAX frames then a changed signal — with cap 1 the output
        tracks the new signal much closer than with cap 31."""
        from nrdsample_tpu.denoise import relax

        h = w = 32
        key = jax.random.PRNGKey(0)
        sig_a = jax.random.uniform(key, (h, w, 3))
        sig_b = 1.0 - sig_a
        vz = jnp.ones((h, w))
        nrm = jnp.zeros((h, w, 3)).at[..., 2].set(1.0)
        mv = jnp.zeros((h, w, 3))

        def run(cap):
            s = relax.RelaxSettings(
                max_accumulated_frames=jnp.float32(cap), atrous_iterations=1
            )
            hist = relax.RelaxHistory.create(h, w, jnp.float32)
            for _ in range(6):
                _, hist = relax.denoise(hist, sig_a, vz, nrm, mv, s)
            out, _ = relax.denoise(hist, sig_b, vz, nrm, mv, s)
            return np.abs(np.asarray(out) - np.asarray(sig_b)).mean()

        # the à-trous spatial blur bounds how close ANY cap can track a random
        # target, so assert the temporal-blend ordering, not a large ratio
        e1, e5, e31 = run(1), run(5), run(31)
        assert e1 < e5 < e31
        assert e1 < 0.7 * e31


class TestEmissiveScale:
    def test_make_scene_keeps_big_emitter_sets(self):
        """Bistro-night-class scenes keep ALL emitters (auto-sized padded set)
        instead of an area-truncated 256 (round-2 review weak #8)."""
        from nrdsample_tpu.scene import procedural

        s = procedural.exterior(blocks=2, window_grid=2, cobbles=8,
                                tree_count=4, tree_res=8, lamp_count=200)
        # 200 lamps x 2 tris min each > 256: all must be kept
        n_emissive = int(s.emissive_count)
        assert n_emissive > 256
        assert s.emissive_tris.shape[0] % 128 == 0

    def test_light_probe_batch_matches_sequential(self):
        """The batched K-candidate probe equals K sequential dense probes."""
        import numpy as np

        from nrdsample_tpu.render import emissive_is
        from nrdsample_tpu.scene import procedural

        scene = procedural.interior_night(n_lights=8, grid=2, sphere_res=10)
        em = emissive_is.build_emissive_set(scene, 1.0)
        rs = np.random.RandomState(0)
        r, k = 256, 4
        o = jnp.asarray((rs.rand(r, 3).astype(np.float32) - 0.5) * 4.0
                        + np.array([0, 0, 1.5], np.float32))
        d = rs.normal(size=(k, r, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
        act = jnp.ones((k, r), jnp.float32)
        batched = emissive_is.light_probe_batch(
            em, o, (d[..., 0], d[..., 1], d[..., 2]), act)
        seq = jnp.stack([emissive_is.light_probe(em, o, d[i])
                         for i in range(k)])
        np.testing.assert_array_equal(np.asarray(batched), np.asarray(seq))
