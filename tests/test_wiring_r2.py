"""End-to-end wiring tests for the round-2 fixes: SIGMA penumbra from real
shadow hitT, dynamic-object motion vectors through render_frame, and the TAA
wide-clamp glass mask.

These test the REAL pipeline path (render_frame), not the denoiser units —
round 1's gap was synthetic-input tests passing while the wired inputs were
degenerate (VERDICT.md "What's weak" #7).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.scene import instances, procedural
from nrdsample_tpu.scene.types import (
    Materials, build_triangle_soa, look_at, make_scene,
)


def _flat_mats(n=1):
    return Materials(
        base_color=np.full((n, 3), 0.7, np.float32),
        metalness=np.zeros(n, np.float32),
        roughness=np.full(n, 0.9, np.float32),
        emission=np.zeros((n, 3), np.float32),
        ior=np.full(n, 1.5, np.float32),
        flags=np.full(n, 1, np.int32),
    )


def _occluder_scene(height: float):
    """Ground plane (top at z=0) + 1x1 occluder slab centered at `height`."""
    vs, is_, ms = [], [], []
    off = 0
    for c, s in [
        ([0, 0, -0.25], [24, 24, 0.5]),
        ([0, 0, height], [1.2, 1.2, 0.15]),
    ]:
        v, i = procedural.make_box(c, s)
        vs.append(v); is_.append(i + off); off += len(v)
        ms += [0] * len(i)
    tris = build_triangle_soa(
        np.concatenate(vs), np.concatenate(is_), None, None,
        np.array(ms, np.int32),
    )
    return make_scene(tris, _flat_mats())


def _render(scene, cam, cfg, settings, n_frames=2, dynamics=None, ctx=None):
    if ctx is None:
        ctx, scene = traversal.build_context(scene)
    hist = frame_mod.History.create(cfg)
    out = None
    fn = jax.jit(
        lambda s, c, st, h: frame_mod.render_frame(
            ctx, s, c, cfg, st, h, dynamics=dynamics
        )
    )
    for _ in range(n_frames):
        out, hist = fn(scene, cam, settings, hist)
    return out, hist


class TestSigmaPenumbraWired:
    """A far occluder must produce a wider denoised penumbra than a contact
    shadow, through render_frame (TraceOpaque.cs.hlsl:767-804 parity)."""

    CFG = RenderConfig(
        width=64, height=64, rpp=1, bounce_num=1,
        tracing_mode=TracingMode.FULL_PROBABILISTIC, denoiser=Denoiser.RELAX,
    )
    # oversized sun disk so the penumbra spans multiple pixels at 64^2
    SETTINGS = Settings(
        sun_elevation=jnp.float32(88.0), sun_angular_diameter=jnp.float32(10.0)
    )

    def _soft_fraction(self, height):
        scene = _occluder_scene(height)
        cam = look_at(eye=[0.0, -3.0, 6.0], target=[0.0, 0.5, 0.0], fov_y_deg=55.0)
        out, _ = _render(scene, cam, self.CFG, self.SETTINGS, n_frames=3)
        shadow = np.asarray(out["shadow"])
        hitdist = np.asarray(out["gbuffer"]["shadow_hit_dist"])
        soft = float(np.mean((shadow > 0.12) & (shadow < 0.88)))
        return soft, shadow, hitdist

    def test_far_occluder_softer_than_contact(self):
        soft_far, shadow_far, hd_far = self._soft_fraction(4.0)
        soft_contact, shadow_contact, hd_contact = self._soft_fraction(0.35)
        # the wired shadow_hit_dist is a real blocker distance, not zeros
        assert hd_far.max() > 2.0
        assert 0.0 < hd_contact.max() < hd_far.max()
        # both scenes have umbra; the far occluder has a visibly wider penumbra
        assert (shadow_far < 0.1).any() and (shadow_contact < 0.1).any()
        assert soft_far > soft_contact * 1.5
        assert soft_far > 0.01

    def test_disable_shadows_zeroes_hitdist(self):
        scene = _occluder_scene(2.0)
        cam = look_at(eye=[0.0, -3.0, 6.0], target=[0.0, 0.5, 0.0], fov_y_deg=55.0)
        s = dataclasses.replace(self.SETTINGS, disable_shadows=jnp.int32(1))
        out, _ = _render(scene, cam, self.CFG, s, n_frames=1)
        assert float(np.abs(np.asarray(out["gbuffer"]["shadow_hit_dist"])).max()) == 0.0
        assert float(np.asarray(out["shadow"]).min()) == 1.0


class TestDynamicMotionVectors:
    """A cube translating along the view axis keeps >=90% of its RELAX history
    when dynamics (worldToWorldPrev) are wired; without them the depth test
    rejects the history (NRDSample.cpp:3395-3630 parity)."""

    def _scene(self):
        vs, is_, ms, inst = [], [], [], []
        off = 0
        gv, gi = procedural.make_box([0, 0, -1.0], [40, 40, 0.5])
        vs.append(gv); is_.append(gi + off); off += len(gv)
        ms += [0] * len(gi); inst += [0] * len(gi)
        bv, bi = procedural.make_box([0, 0, 0.5], [2.0, 2.0, 2.0])
        vs.append(bv); is_.append(bi + off); off += len(bv)
        ms += [0] * len(bi); inst += [1] * len(bi)
        tris = build_triangle_soa(
            np.concatenate(vs), np.concatenate(is_), None, None,
            np.array(ms, np.int32),
        )
        return make_scene(tris, _flat_mats()), np.array(inst, np.int32)

    def _run(self, use_dynamics: bool):
        scene, inst_ids = self._scene()
        ctx, scene2 = traversal.build_context(scene, mode="cluster")
        inst = instances.assign_instance_ids(scene2, inst_ids, ctx)
        cam = look_at(eye=[0.0, -14.0, 3.0], target=[0.0, 0.0, 0.5], fov_y_deg=45.0)
        cfg = RenderConfig(
            width=64, height=64, rpp=1, bounce_num=1,
            tracing_mode=TracingMode.FULL_PROBABILISTIC, denoiser=Denoiser.RELAX,
        )
        settings = Settings(
            sun_elevation=jnp.float32(55.0), disable_shadows=jnp.int32(1)
        )
        hist = frame_mod.History.create(cfg)

        def transforms(t):
            m = instances.identity_transforms(2)
            return m.at[1, 1, 3].set(0.6 * t)   # slide along +y (view axis)

        @jax.jit
        def step(t, t_prev, h):
            m_curr, m_prev = transforms(t), transforms(t_prev)
            world = instances.transform_scene(inst, m_curr)
            ctx2 = instances.refit_context(ctx, world)
            dyn = (inst, m_curr, m_prev) if use_dynamics else None
            return frame_mod.render_frame(
                ctx2, world, cam, cfg, settings, h, dynamics=dyn
            )

        out = None
        for f in range(3):
            out, hist = step(
                jnp.float32(f), jnp.float32(max(f - 1, 0)), hist
            )
        tri = np.asarray(out["gbuffer"]["tri"])
        iid = np.asarray(inst.instance_id)
        cube = ((tri >= 0) & (iid[np.clip(tri, 0, len(iid) - 1)] == 1)).reshape(64, 64)
        # erode 2px: silhouette pixels are genuinely disoccluded as the cube
        # grows on approach — only interior pixels must hold history
        for _ in range(2):
            e = cube.copy()
            for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
                e &= np.roll(cube, (dy, dx), axis=(0, 1))
            cube = e
        frames = np.asarray(hist.relax_diff.frames)
        return frames[cube], cube

    def test_history_survives_motion_with_dynamics(self):
        frames_dyn, cube = self._run(True)
        assert cube.sum() > 40  # the (eroded) cube covers a real pixel area
        # >=90% of cube pixels keep full 3-frame history
        assert float(np.mean(frames_dyn >= 2.5)) >= 0.9

    def test_history_rejected_without_dynamics(self):
        frames_static, _ = self._run(False)
        # Xprev = X mispredicts depth by ~4%/frame -> disocclusion rejects
        assert float(np.mean(frames_static >= 2.5)) < 0.5


class TestTaaGlassWideMask:
    """The TAA wide-clamp mask must cover glass pixels via the transparent-pass
    hit mask (Taa.cs.hlsl:77; round-1 used the opaque flags, which never carry
    FLAG_TRANSPARENT — VERDICT.md weak #4)."""

    def test_glass_pixels_get_wide_clamp(self):
        from nrdsample_tpu.scene import glass_shell

        scene = glass_shell.add_inner_glass_surfaces(procedural.cornell_box_glass())
        ctxs, scene = traversal.build_scene_contexts(scene)
        cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
        cfg = RenderConfig(
            width=48, height=48, rpp=1, bounce_num=1,
            tracing_mode=TracingMode.FULL_PROBABILISTIC,
            denoiser=Denoiser.REFERENCE, use_taa=True,
        )
        out, _ = _render(scene, cam, cfg, Settings(), n_frames=1, ctx=ctxs)
        glass = np.asarray(out["glass_mask"])
        wide = np.asarray(out["taa_wide_mask"])
        assert glass.sum() > 20
        assert bool(np.all(wide[glass]))
