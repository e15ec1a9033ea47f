"""Normal mapping + per-vertex tangents (RaytracingShared.hlsli:398-412
tangent decode; :467-479 TransformLocalNormal + local curvature).

Checks the decoded shading normal against the ANALYTIC perturbed normal for a
quad with a known TBN frame, the gUseNormalMap toggle, UV-derived tangent
correctness, glTF TANGENT parsing, and that bumped shading actually changes a
rendered image."""

import dataclasses as dc

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.render import gbuffer
from nrdsample_tpu.scene import procedural, textures as tex_mod
from nrdsample_tpu.scene.types import Materials, build_triangle_soa, make_scene


def _flat_mats(n=1):
    return Materials(
        base_color=np.full((n, 3), 0.8, np.float32),
        metalness=np.zeros(n, np.float32),
        roughness=np.full(n, 0.7, np.float32),
        emission=np.zeros((n, 3), np.float32),
        ior=np.full(n, 1.5, np.float32),
        flags=np.full(n, 1, np.int32),
    )


def _quad_scene(normal_map=None, tangents=None):
    """Unit quad in the XY plane (z=0), UVs aligned so T=+X, B=+Y, N=+Z."""
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    tris = build_triangle_soa(verts, idx, nrm, uvs,
                              np.zeros(2, np.int32), tangents=tangents)
    scene = make_scene(tris, _flat_mats())
    if normal_map is not None:
        ts = tex_mod.build_texture_set([{"normal": normal_map}], res=8)
        scene = dc.replace(scene, textures=ts)
    return scene


def _decode(scene, **kw):
    """Decode a hit at the quad center, ray straight down."""
    hit = {
        "tri": jnp.array([0], jnp.int32),
        "u": jnp.array([0.4], jnp.float32),
        "v": jnp.array([0.3], jnp.float32),
        "t": jnp.array([2.0], jnp.float32),
    }
    origin = jnp.array([[0.5, 0.4, 2.0]], jnp.float32)
    direction = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)
    sun = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    return gbuffer.decode_hit(scene, hit, origin, direction, sun, 0.01, **kw)


class TestTangentDerivation:
    def test_uv_derived_tangent_matches_chart(self):
        scene = _quad_scene()
        props = _decode(scene)
        t = np.asarray(props["tangent"])[0]
        np.testing.assert_allclose(t, [1.0, 0.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(props["n"])[0], [0, 0, 1], atol=1e-5)

    def test_explicit_gltf_style_tangents_win(self):
        tang = np.tile(np.array([[0, 1, 0, 1]], np.float32), (4, 1))
        scene = _quad_scene(tangents=tang)
        props = _decode(scene)
        np.testing.assert_allclose(
            np.asarray(props["tangent"])[0], [0, 1, 0], atol=1e-5
        )

    def test_degenerate_uv_falls_back(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        uvs = np.zeros((3, 2), np.float32)  # degenerate chart
        tris = build_triangle_soa(verts, np.array([[0, 1, 2]], np.int32),
                                  None, uvs, np.zeros(1, np.int32))
        t = np.asarray(tris.t0)[0]
        assert abs(np.linalg.norm(t) - 1.0) < 1e-5
        assert abs(t @ np.array([0, 0, 1.0])) < 1e-5  # orthogonal to normal


class TestNormalMapping:
    def test_analytic_perturbed_normal(self):
        # constant tangent-space normal (0.3, -0.2, z): stored in [0,1] image
        # convention; the decoded world normal must match the analytic TBN mix
        nx, ny = 0.3, -0.2
        nm = np.full((8, 8, 2), 0.0, np.float32)
        nm[..., 0] = (nx + 1.0) / 2.0
        nm[..., 1] = (ny + 1.0) / 2.0
        scene = _quad_scene(normal_map=nm)
        props = _decode(scene)
        nz = np.sqrt(1.0 - nx * nx - ny * ny)
        expected = np.array([nx, ny, nz], np.float32)  # T=+X, B=+Y, N=+Z
        np.testing.assert_allclose(
            np.asarray(props["n"])[0], expected, atol=2e-2
        )
        # tangent re-orthogonalized against the mapped normal
        assert abs(float(np.asarray(props["n"])[0] @ np.asarray(props["tangent"])[0])) < 1e-4

    def test_toggle_disables_perturbation(self):
        nm = np.full((8, 8, 2), 0.9, np.float32)
        scene = _quad_scene(normal_map=nm)
        props = _decode(scene, use_normal_map=jnp.int32(0))
        np.testing.assert_allclose(np.asarray(props["n"])[0], [0, 0, 1], atol=1e-5)

    def test_local_curvature_from_map(self):
        nm = np.full((8, 8, 2), 0.5, np.float32)  # flat in Y
        nm[..., 0] = (0.5 + 1.0) / 2.0            # Nlocal.x = 0.5
        scene = _quad_scene(normal_map=nm)
        cw = jnp.array([0.05], jnp.float32)
        props = _decode(scene, cone_width=cw)
        # length(Nlocal.xy)/footprint = 0.5/0.05 = 10
        assert float(np.asarray(props["curvature"])[0]) == pytest.approx(10.0, rel=0.1)

    def test_flat_map_is_identity(self):
        nm = np.full((8, 8, 2), 0.5, np.float32)  # (0,0) tangent-space
        scene = _quad_scene(normal_map=nm)
        props = _decode(scene)
        np.testing.assert_allclose(np.asarray(props["n"])[0], [0, 0, 1], atol=1e-5)


class TestWiredBumpedRender:
    def test_bumped_plane_changes_image(self):
        """render_frame on a ground plane with a strong ripple normal map must
        differ from the flat render (and stay finite)."""
        import jax

        from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
        from nrdsample_tpu.ops import traversal
        from nrdsample_tpu.pipeline import frame as frame_mod
        from nrdsample_tpu.scene.types import look_at

        v, i = procedural.make_box([0, 0, -0.25], [8, 8, 0.5])
        tris = build_triangle_soa(v, i, None, None, np.zeros(len(i), np.int32))
        scene = make_scene(tris, _flat_mats())
        yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        ripple = np.stack(
            [0.5 + 0.4 * np.sin(xx * 1.3), 0.5 + 0.4 * np.sin(yy * 1.3)], -1
        ).astype(np.float32)
        ts = tex_mod.build_texture_set([{"normal": ripple}], res=32)
        scene = dc.replace(scene, textures=ts)
        ctx, scene = traversal.build_context(scene)
        cam = look_at(eye=[0, -4, 3], target=[0, 0, 0], fov_y_deg=50.0)
        cfg = RenderConfig(width=32, height=32, rpp=1, bounce_num=1,
                           tracing_mode=TracingMode.FULL_PROBABILISTIC,
                           denoiser=Denoiser.REFERENCE)
        hist = frame_mod.History.create(cfg)

        def render(use_nm):
            s = Settings(sun_elevation=jnp.float32(50.0),
                         use_normal_map=jnp.int32(use_nm))
            out, _ = frame_mod.render_frame(ctx, scene, cam, cfg, s, hist)
            return np.asarray(out["color"])

        bumped, flat = render(1), render(0)
        assert np.isfinite(bumped).all()
        diff = np.abs(bumped - flat).mean() / (np.abs(flat).mean() + 1e-9)
        assert diff > 0.02, f"normal map had no visible effect: {diff}"
