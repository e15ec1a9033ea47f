"""Inner glass-shell synthesis (AddInnerGlassSurfaces, NRDSample.cpp:2243-2278)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu import config
from nrdsample_tpu.scene import glass_shell, procedural


def test_adds_flipped_inner_copies():
    scene = procedural.cornell_box_glass()
    flags = np.asarray(scene.materials.flags)
    mat = np.asarray(scene.tris.material)
    n_trans = int(((flags[mat] & config.FLAG_TRANSPARENT) != 0).sum())
    assert n_trans > 0

    out = glass_shell.add_inner_glass_surfaces(scene, thickness=0.1)
    assert out.tris.count == scene.tris.count + n_trans

    # inner copies shrink toward the group centroid: total transparent area up
    # by ~(1-t)^2 of the original transparent area
    area_old = np.asarray(scene.tris.world_area)
    area_new = np.asarray(out.tris.world_area)
    added = area_new[scene.tris.count:]
    orig_trans = area_old[(flags[mat] & config.FLAG_TRANSPARENT) != 0]
    np.testing.assert_allclose(added.sum(), orig_trans.sum() * 0.81, rtol=1e-4)

    # flipped winding: geometric normals of the copies oppose the originals
    def geom_n(tris, i):
        e1 = np.asarray(tris.e1)[i]
        e2 = np.asarray(tris.e2)[i]
        n = np.cross(e1, e2)
        return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)

    src = np.nonzero((flags[mat] & config.FLAG_TRANSPARENT) != 0)[0]
    n_orig = geom_n(scene.tris, src)
    n_copy = geom_n(out.tris, np.arange(scene.tris.count, out.tris.count))
    dots = (n_orig * n_copy).sum(axis=-1)
    assert (dots < -0.99).all()


def test_noop_without_transparent():
    scene = procedural.cornell_box()
    out = glass_shell.add_inner_glass_surfaces(scene)
    assert out is scene


def test_shell_scene_still_renders():
    from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
    from nrdsample_tpu.ops import traversal
    from nrdsample_tpu.pipeline import frame as frame_mod
    from nrdsample_tpu.scene.types import look_at

    scene = glass_shell.add_inner_glass_surfaces(procedural.cornell_box_glass())
    ctxs, scene = traversal.build_scene_contexts(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    cfg = RenderConfig(width=32, height=32, rpp=1, bounce_num=1,
                       tracing_mode=TracingMode.FULL_PROBABILISTIC,
                       denoiser=Denoiser.REFERENCE)
    settings = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
    out, _ = frame_mod.render_frame(
        ctxs, scene, cam, cfg, settings, frame_mod.History.create(cfg)
    )
    assert np.isfinite(np.asarray(out["color"])).all()


def test_glass_shadow_translucency():
    """Glass between the sun and a surface casts a PARTIAL shadow
    (SIGMA_TRANSLUCENCY, TraceOpaque.cs.hlsl:767-804)."""
    import dataclasses

    from nrdsample_tpu.scene.types import Materials, build_triangle_soa, make_scene
    from nrdsample_tpu.ops import traversal
    from nrdsample_tpu.pipeline import frame as frame_mod
    from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
    from nrdsample_tpu.scene.types import look_at

    # ground plane + a glass slab above it; sun straight overhead
    gv, gi = procedural.make_box([0, 0, -0.5], [20, 20, 1.0])
    pv, pi = procedural.make_box([0, 0, 3.0], [4, 4, 0.1])
    verts = np.concatenate([gv, pv])
    idx = np.concatenate([gi, pi + len(gv)])
    mat = np.array([0] * len(gi) + [1] * len(pi), np.int32)
    tris = build_triangle_soa(verts, idx, None, None, mat)
    mats = Materials(
        base_color=np.array([[0.7, 0.7, 0.7], [0.9, 0.9, 0.9]], np.float32),
        metalness=np.zeros(2, np.float32),
        roughness=np.array([0.8, 0.05], np.float32),
        emission=np.zeros((2, 3), np.float32),
        ior=np.full(2, 1.5, np.float32),
        flags=np.array([config.FLAG_NON_TRANSPARENT, config.FLAG_TRANSPARENT],
                       np.int32),
    )
    scene = make_scene(tris, mats)
    ctxs, scene = traversal.build_scene_contexts(scene)
    cam = look_at(eye=[0.0, -8.0, 4.0], target=[0.0, 0.0, 0.0], fov_y_deg=40.0)
    cfg = RenderConfig(width=32, height=32, rpp=1, bounce_num=1,
                       tracing_mode=TracingMode.FULL_PROBABILISTIC,
                       denoiser=Denoiser.REFERENCE)
    settings = Settings(sun_elevation=jnp.float32(89.0))
    out, _ = frame_mod.render_frame(
        ctxs, scene, cam, cfg, settings, frame_mod.History.create(cfg)
    )
    shadow = np.asarray(out["shadow"]).reshape(32, 32)
    # ground pixels under the glass slab show a PARTIAL shadow: the march
    # (TraceOpaque.cs.hlsl:780-798 semantics) crosses BOTH slab interfaces,
    # each attenuating by 0.9 (NoV=1) x 0.9 tint -> (0.81)^2 = 0.6561
    partial = (shadow > 0.05) & (shadow < 0.999)
    assert partial.sum() >= 8, "no partial (translucent) shadow found"
    vals = shadow[partial]
    np.testing.assert_allclose(vals, 0.81 ** 2, atol=0.02)
    assert (shadow > 0.999).sum() >= 8, "unshadowed ground must remain lit"
