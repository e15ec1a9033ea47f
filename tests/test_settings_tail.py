"""Settings-tail parity: moving-emission fix (Shared.hlsli:23,
TraceOpaque.cs.hlsl:714-718), lights/cubes emission split
(NRDSample.cpp:243-244), indirect kill switches, dynamic camFov, blink,
mvType export."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nrdsample_tpu import config as cfgmod
from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.scene import instances, procedural
from nrdsample_tpu.scene.types import Materials, build_triangle_soa, look_at, make_scene

RES = 32


def _emitter_scene(cube_flag=False):
    """Dark room floor + an emissive slab. cube_flag marks the emitter as a
    FLAG_FORCED_EMISSION material (the animated-cubes slot)."""
    vs, is_, ms = [], [], []
    off = 0
    for c, s, m in [
        ([0, 0, -0.25], [20, 20, 0.5], 0),
        ([0, 0, 1.0], [1.5, 1.5, 1.0], 1),
    ]:
        v, i = procedural.make_box(c, s)
        vs.append(v); is_.append(i + off); off += len(v)
        ms += [m] * len(i)
    flags = np.array([cfgmod.FLAG_NON_TRANSPARENT,
                      cfgmod.FLAG_NON_TRANSPARENT
                      | (cfgmod.FLAG_FORCED_EMISSION if cube_flag else 0)],
                     np.int32)
    mats = Materials(
        base_color=np.array([[0.6, 0.6, 0.6], [0.9, 0.9, 0.9]], np.float32),
        metalness=np.zeros(2, np.float32),
        roughness=np.ones(2, np.float32),
        emission=np.array([[0, 0, 0], [8.0, 6.0, 4.0]], np.float32),
        ior=np.full(2, 1.5, np.float32),
        flags=flags,
    )
    tris = build_triangle_soa(
        np.concatenate(vs), np.concatenate(is_), None, None,
        np.array(ms, np.int32),
    )
    return make_scene(tris, mats)


def _cfg(**kw):
    kw.setdefault("tracing_mode", TracingMode.FULL_PROBABILISTIC)
    kw.setdefault("denoiser", Denoiser.REFERENCE)
    kw.setdefault("rpp", 1)
    kw.setdefault("bounce_num", 1)
    return RenderConfig(width=RES, height=RES, **kw)


_CAM = dict(eye=[0.0, -6.0, 3.0], target=[0.0, 0.0, 0.8], fov_y_deg=55.0)


def _render(scene, cfg, settings, n_frames=1, cam=None):
    ctx, scene = traversal.build_context(scene)
    cam = look_at(**(cam or _CAM))
    hist = frame_mod.History.create(cfg)
    out = None
    fn = jax.jit(lambda s, c, st, h: frame_mod.render_frame(ctx, s, c, cfg, st, h))
    for _ in range(n_frames):
        out, hist = fn(scene, cam, settings, hist)
    return out


class TestMovingEmissionFix:
    def test_emission_rides_in_denoised_signals(self):
        """With the fix ON the demodulated diff/spec signals carry
        Lemi/2pi at emitter pixels; OFF leaves them emission-free."""
        scene = _emitter_scene()
        s = Settings(sun_elevation=jnp.float32(-30.0),
                     disable_shadows=jnp.int32(1))
        out_on = _render(scene, _cfg(use_moving_emission_fix=True), s)
        out_off = _render(scene, _cfg(use_moving_emission_fix=False), s)
        emi = np.asarray(out_on["gbuffer"]["emission"])
        lit = emi.max(-1) > 1.0
        assert lit.any()
        d_on = np.asarray(out_on["gbuffer"]["diff_radiance"])
        d_off = np.asarray(out_off["gbuffer"]["diff_radiance"])
        expected = emi[lit] / (2.0 * np.pi)
        np.testing.assert_allclose(d_on[lit] - d_off[lit], expected, rtol=1e-4)
        s_on = np.asarray(out_on["gbuffer"]["spec_radiance"])
        s_off = np.asarray(out_off["gbuffer"]["spec_radiance"])
        np.testing.assert_allclose(s_on[lit] - s_off[lit], expected, rtol=1e-4)

    def test_no_dark_tail_behind_moving_emitter(self):
        """A translating emissive cube (RELAX, wired dynamics): pixels it
        vacated keep a brighter denoised-diffuse history with the fix ON."""
        def run(fix):
            vs, is_, ms, inst = [], [], [], []
            off = 0
            gv, gi = procedural.make_box([0, 0, -0.5], [30, 30, 1.0])
            vs.append(gv); is_.append(gi + off); off += len(gv)
            ms += [0] * len(gi); inst += [0] * len(gi)
            bv, bi = procedural.make_box([0, 0, 1.0], [1.5, 1.5, 1.5])
            vs.append(bv); is_.append(bi + off)
            ms += [1] * len(bi); inst += [1] * len(bi)
            mats = Materials(
                base_color=np.array([[0.6, 0.6, 0.6], [0.9, 0.9, 0.9]], np.float32),
                metalness=np.zeros(2, np.float32),
                roughness=np.ones(2, np.float32),
                emission=np.array([[0, 0, 0], [10.0, 10.0, 10.0]], np.float32),
                ior=np.full(2, 1.5, np.float32),
                flags=np.array([1, 1 | cfgmod.FLAG_FORCED_EMISSION], np.int32),
            )
            tris = build_triangle_soa(
                np.concatenate(vs), np.concatenate(is_), None, None,
                np.array(ms, np.int32))
            scene = make_scene(tris, mats)
            ctx, scene2 = traversal.build_context(scene, mode="cluster")
            inst_s = instances.assign_instance_ids(
                scene2, np.array(inst, np.int32), ctx)
            cam = look_at(eye=[0.0, -10.0, 6.0], target=[0.0, 0.0, 0.8],
                          fov_y_deg=55.0)
            cfg = _cfg(denoiser=Denoiser.RELAX,
                       use_moving_emission_fix=fix)
            s = Settings(sun_elevation=jnp.float32(-30.0),
                         disable_shadows=jnp.int32(1))
            hist = frame_mod.History.create(cfg)

            def transforms(t):
                m = instances.identity_transforms(2)
                return m.at[1, 0, 3].set(1.2 * t)  # slide along +x

            @jax.jit
            def step(t, t_prev, h):
                m_curr, m_prev = transforms(t), transforms(t_prev)
                world = instances.transform_scene(inst_s, m_curr)
                ctx2 = instances.refit_context(ctx, world)
                return frame_mod.render_frame(
                    ctx2, world, cam, cfg, s, h,
                    dynamics=(inst_s, m_curr, m_prev),
                )
            out = None
            for f in range(3):
                out, hist = step(jnp.float32(f), jnp.float32(max(f - 1, 0)), hist)
            return np.asarray(out["diff_denoised"]
                              if "diff_denoised" in out else out["color"])

        bright_on = run(True).mean()
        bright_off = run(False).mean()
        assert bright_on > bright_off * 1.02, (bright_on, bright_off)


class TestEmissionSplit:
    def test_cubes_intensity_scales_forced_emission_only(self):
        s_base = Settings(sun_elevation=jnp.float32(-30.0),
                          disable_shadows=jnp.int32(1))
        s_cubes = dataclasses.replace(
            s_base, emission_intensity_cubes=jnp.float32(3.0))
        # regular emissive material: cubes scale must NOT touch it
        out_reg = _render(_emitter_scene(False), _cfg(), s_cubes)
        out_reg0 = _render(_emitter_scene(False), _cfg(), s_base)
        np.testing.assert_allclose(
            np.asarray(out_reg["color"]), np.asarray(out_reg0["color"]), rtol=1e-5
        )
        # forced-emission material: scales 3x
        out_cube = _render(_emitter_scene(True), _cfg(), s_cubes)
        out_cube0 = _render(_emitter_scene(True), _cfg(), s_base)
        emi0 = np.asarray(out_cube0["gbuffer"]["emission"])
        emi1 = np.asarray(out_cube["gbuffer"]["emission"])
        lit = emi0.max(-1) > 1.0
        np.testing.assert_allclose(emi1[lit], emi0[lit] * 3.0, rtol=1e-4)

    def test_blink_modulates_cubes(self):
        s = Settings(sun_elevation=jnp.float32(-30.0),
                     disable_shadows=jnp.int32(1), blink=jnp.int32(1))
        scene = _emitter_scene(True)
        ctx, scene = traversal.build_context(scene)
        cam = look_at(**_CAM)
        cfg = _cfg()
        hist = frame_mod.History.create(cfg)
        fn = jax.jit(lambda st, h: frame_mod.render_frame(
            ctx, scene, cam, cfg, st, h))
        peaks = []
        for _ in range(6):
            out, hist = fn(s, hist)
            peaks.append(float(np.asarray(out["gbuffer"]["emission"]).max()))
        assert max(peaks) > min(peaks) * 1.5, peaks


class TestIndirectKillSwitches:
    def test_indirect_diffuse_off_zeroes_signal(self):
        scene = procedural.cornell_box()
        s = Settings(sun_elevation=jnp.float32(-30.0),
                     disable_shadows=jnp.int32(1),
                     indirect_diffuse=jnp.int32(0))
        cfg = _cfg(use_moving_emission_fix=False, bounce_num=2)
        out = _render(scene, cfg, s,
                      cam=dict(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0],
                               fov_y_deg=39.0))
        assert float(np.abs(np.asarray(out["gbuffer"]["diff_radiance"])).max()) == 0.0
        assert float(np.abs(np.asarray(out["gbuffer"]["spec_radiance"])).max()) > 0.0

    def test_indirect_specular_off_zeroes_signal(self):
        scene = procedural.cornell_box()
        s = Settings(sun_elevation=jnp.float32(-30.0),
                     disable_shadows=jnp.int32(1),
                     indirect_specular=jnp.int32(0))
        cfg = _cfg(use_moving_emission_fix=False, bounce_num=2)
        out = _render(scene, cfg, s,
                      cam=dict(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0],
                               fov_y_deg=39.0))
        assert float(np.abs(np.asarray(out["gbuffer"]["spec_radiance"])).max()) == 0.0
        assert float(np.abs(np.asarray(out["gbuffer"]["diff_radiance"])).max()) > 0.0


class TestDynamicCamFov:
    def test_cam_fov_override_changes_coverage(self):
        scene = _emitter_scene()
        s_wide = Settings(sun_elevation=jnp.float32(-30.0),
                          disable_shadows=jnp.int32(1),
                          cam_fov=jnp.float32(100.0))
        s_def = Settings(sun_elevation=jnp.float32(-30.0),
                         disable_shadows=jnp.int32(1))
        out_w = _render(scene, _cfg(), s_wide)
        out_d = _render(scene, _cfg(), s_def)
        # wider FoV -> emitter covers fewer pixels
        lit_w = (np.asarray(out_w["gbuffer"]["emission"]).max(-1) > 1.0).sum()
        lit_d = (np.asarray(out_d["gbuffer"]["emission"]).max(-1) > 1.0).sum()
        assert 0 < lit_w < lit_d


class TestMvTypeExport:
    def test_mv_world_plane_present_and_selected(self):
        from nrdsample_tpu.post import guides

        scene = _emitter_scene()
        s = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
        out = _render(scene, _cfg(), s)
        gb = out["gbuffer"]
        assert "mv_world" in gb
        g25 = guides.rr_guides(gb, near=0.01, mv_type=jnp.int32(0))
        g3 = guides.rr_guides(gb, near=0.01, mv_type=jnp.int32(1))
        np.testing.assert_allclose(np.asarray(g25["mv"]), np.asarray(gb["mv"]))
        np.testing.assert_allclose(np.asarray(g3["mv"]), np.asarray(gb["mv_world"]))


class TestInstanceMaterialScales:
    def test_scales_apply_per_instance(self):
        """InstanceData scale factors (RaytracingShared.hlsli:456-468): an
        instance-scaled emitter doubles its emission while the static
        background instance is untouched."""
        vs, is_, ms, inst = [], [], [], []
        off = 0
        gv, gi = procedural.make_box([0, 0, -0.25], [20, 20, 0.5])
        vs.append(gv); is_.append(gi + off); off += len(gv)
        ms += [0] * len(gi); inst += [0] * len(gi)
        bv, bi = procedural.make_box([0, 0, 1.0], [1.5, 1.5, 1.0])
        vs.append(bv); is_.append(bi + off)
        ms += [1] * len(bi); inst += [1] * len(bi)
        mats = Materials(
            base_color=np.array([[0.6, 0.6, 0.6], [0.9, 0.9, 0.9]], np.float32),
            metalness=np.zeros(2, np.float32),
            roughness=np.ones(2, np.float32),
            emission=np.array([[0, 0, 0], [5.0, 5.0, 5.0]], np.float32),
            ior=np.full(2, 1.5, np.float32),
            flags=np.ones(2, np.int32),
        )
        tris = build_triangle_soa(
            np.concatenate(vs), np.concatenate(is_), None, None,
            np.array(ms, np.int32))
        scene = make_scene(tris, mats)
        ctx, scene2 = traversal.build_context(scene, mode="cluster")
        scales = np.ones((2, 10), np.float32)
        scales[1, 4:7] = 2.0      # instance 1 emission x2
        scales[1, 7] = 0.5        # roughness x0.5

        def run(with_scales):
            inst_s = instances.assign_instance_ids(
                scene2, np.array(inst, np.int32), ctx,
                instance_scales=scales if with_scales else None)
            world = instances.transform_scene(
                inst_s, instances.identity_transforms(2))
            s = Settings(sun_elevation=jnp.float32(-30.0),
                         disable_shadows=jnp.int32(1))
            cfg = _cfg()
            hist = frame_mod.History.create(cfg)
            out, _ = frame_mod.render_frame(
                instances.refit_context(ctx, world), world,
                look_at(eye=[0.0, -10.0, 6.0], target=[0.0, 0.0, 0.8],
                        fov_y_deg=55.0),
                cfg, s, hist)
            return out

        out_s, out_p = run(True), run(False)
        emi_s = np.asarray(out_s["gbuffer"]["emission"])
        emi_p = np.asarray(out_p["gbuffer"]["emission"])
        lit = emi_p.max(-1) > 1.0
        assert lit.any()
        np.testing.assert_allclose(emi_s[lit], emi_p[lit] * 2.0, rtol=1e-4)
        rough_s = np.asarray(out_s["gbuffer"]["roughness"])
        rough_p = np.asarray(out_p["gbuffer"]["roughness"])
        np.testing.assert_allclose(rough_s[lit], rough_p[lit] * 0.5, rtol=1e-4)
        # background instance untouched
        np.testing.assert_allclose(emi_s[~lit], emi_p[~lit], atol=1e-6)
