"""Material textures, ray-cone LOD, and the alpha-test traversal loop.

Reference parity targets: bindless texture fetches + mip from ray cones
(RaytracingShared.hlsli:154-189, 424-555) and CheckNonOpaqueTriangle
(:191-247).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu import config
from nrdsample_tpu.render import raycone
from nrdsample_tpu.scene import textures as tex_mod


def _checker(res, c0=0.0, c1=1.0):
    y, x = np.mgrid[0:res, 0:res]
    return np.where(((x // 8) + (y // 8)) % 2 == 0, c0, c1).astype(np.float32)


def test_build_and_sample_base_mip():
    img = np.stack([_checker(64), _checker(64), _checker(64)], axis=-1)
    ts = tex_mod.build_texture_set([{"base_color": img}], res=64)
    assert ts.n_mips == 7  # 64 -> 1
    # mip 0 point lookup at a known texel center
    uv = jnp.asarray([[4.5 / 64, 4.5 / 64], [12.5 / 64, 4.5 / 64]], jnp.float32)
    mat = jnp.zeros((2,), jnp.int32)
    out = tex_mod.sample(ts, mat, uv, jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(out[0, :3]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1, :3]), 1.0, atol=1e-5)


def test_highest_mip_is_mean():
    img = np.stack([_checker(32)] * 3, axis=-1)
    ts = tex_mod.build_texture_set([{"base_color": img}], res=32)
    uv = jnp.asarray([[0.3, 0.7]], jnp.float32)
    out = tex_mod.sample(ts, jnp.zeros((1,), jnp.int32), uv, jnp.full((1,), 99.0))
    np.testing.assert_allclose(np.asarray(out[0, :3]), 0.5, atol=1e-5)


def test_trilinear_between_mips():
    img = np.stack([_checker(32)] * 3, axis=-1)
    ts = tex_mod.build_texture_set([{"base_color": img}], res=32)
    uv = jnp.asarray([[0.26, 0.26]], jnp.float32)
    mat = jnp.zeros((1,), jnp.int32)
    v0 = tex_mod.sample(ts, mat, uv, jnp.asarray([2.0]))
    v1 = tex_mod.sample(ts, mat, uv, jnp.asarray([3.0]))
    vh = tex_mod.sample(ts, mat, uv, jnp.asarray([2.5]))
    np.testing.assert_allclose(
        np.asarray(vh), np.asarray(0.5 * (v0 + v1)), atol=1e-5
    )


def test_multi_material_stacking():
    ts = tex_mod.build_texture_set(
        [{"base_color": np.zeros((8, 8, 3), np.float32)},
         {"base_color": np.ones((8, 8, 3), np.float32)}], res=8,
    )
    uv = jnp.full((2, 2), 0.5, jnp.float32)
    out = tex_mod.sample(ts, jnp.asarray([0, 1], jnp.int32), uv, jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(out[0, :3]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1, :3]), 1.0, atol=1e-6)


def test_raycone_mip_monotone_in_distance():
    """Farther hits with the same geometry must fetch coarser mips."""
    widths = jnp.asarray([0.1, 0.4, 1.6])
    mip = raycone.texture_mip(
        widths, world_area=jnp.full((3,), 1.0), uv_area=jnp.full((3,), 0.01),
        n_dot_v=jnp.ones((3,)), tex_res=128,
    )
    m = np.asarray(mip)
    assert m[0] <= m[1] <= m[2]
    # each 4x width step adds log2(4) = 2 mips (footprint is width^2)
    assert m[2] - m[0] == pytest.approx(4.0, abs=0.3)


def test_raycone_grazing_blurrier():
    mip_n = raycone.texture_mip(jnp.asarray([0.01]), jnp.asarray([1.0]),
                                jnp.asarray([0.01]), jnp.asarray([1.0]), 128)
    mip_g = raycone.texture_mip(jnp.asarray([0.01]), jnp.asarray([1.0]),
                                jnp.asarray([0.01]), jnp.asarray([0.1]), 128)
    assert float(mip_g[0]) > float(mip_n[0])


def _two_quad_scene(alpha_map):
    """Front alpha-tested quad at y=0, solid back quad at y=2."""
    from nrdsample_tpu.scene.types import Materials, build_triangle_soa, make_scene

    verts = np.array([
        # front quad (z up, facing -y)
        [-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1],
        # back quad
        [-2, 2, -2], [2, 2, -2], [2, 2, 2], [-2, 2, 2],
    ], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]] * 2, np.float32)
    mat = np.array([0, 0, 1, 1], np.int32)
    tris = build_triangle_soa(verts, idx, None, uvs, mat)
    mats = Materials(
        base_color=jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        metalness=jnp.zeros(2), roughness=jnp.ones(2) * 0.5,
        emission=jnp.zeros((2, 3)), ior=jnp.full(2, 1.5),
        flags=jnp.asarray(
            [config.FLAG_NON_TRANSPARENT | config.FLAG_ALPHA_TEST,
             config.FLAG_NON_TRANSPARENT], jnp.int32,
        ),
    )
    scene = make_scene(tris, mats)
    import dataclasses as dc

    ts = tex_mod.build_texture_set([{"alpha": alpha_map}, {}], res=32)
    return dc.replace(scene, textures=ts, has_alpha_test=True)


def test_alpha_test_passthrough_and_block():
    from nrdsample_tpu.ops import traversal

    # left half of the front quad transparent (alpha 0), right half opaque
    alpha = np.ones((32, 32), np.float32)
    alpha[:, :16] = 0.0
    scene = _two_quad_scene(alpha)
    ctx, scene2 = traversal.build_context(scene)
    # NOTE: build_context may reorder tris but preserves scene fields
    o = jnp.asarray([[-0.5, -3.0, 0.0], [0.5, -3.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    res = traversal.closest_hit_alpha(ctx, scene2, o, d)
    t = np.asarray(res["t"])
    # ray through the transparent half reaches the back quad (t=5);
    # ray through the opaque half stops at the front quad (t=3)
    assert t[0] == pytest.approx(5.0, abs=1e-3)
    assert t[1] == pytest.approx(3.0, abs=1e-3)


def test_alpha_test_disabled_when_flag_missing():
    from nrdsample_tpu.ops import traversal

    alpha = np.zeros((32, 32), np.float32)
    scene = _two_quad_scene(alpha)
    import dataclasses as dc

    scene = dc.replace(scene, has_alpha_test=False)
    ctx, scene2 = traversal.build_context(scene)
    o = jnp.asarray([[0.0, -3.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    res = traversal.closest_hit_alpha(ctx, scene2, o, d)
    assert float(res["t"][0]) == pytest.approx(3.0, abs=1e-3)


def test_textured_decode_hit_modulates_base_color():
    """decode_hit multiplies material constants by the texture fetch."""
    from nrdsample_tpu.ops import traversal
    from nrdsample_tpu.render import gbuffer

    alpha = np.ones((32, 32), np.float32)
    scene = _two_quad_scene(alpha)
    import dataclasses as dc

    # red->blue gradient base-color texture on material 0
    grad = np.zeros((32, 32, 3), np.float32)
    grad[:, :, 0] = np.linspace(0, 1, 32)[None, :]
    ts = tex_mod.build_texture_set([{"base_color": grad}, {}], res=32)
    scene = dc.replace(scene, textures=ts)
    ctx, scene2 = traversal.build_context(scene)
    o = jnp.asarray([[0.9, -3.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    hit = traversal.closest_hit(ctx, o, d)
    props = gbuffer.decode_hit(
        scene2, hit, o, d, jnp.asarray([0.0, 0.0, 1.0]), 0.005,
        cone_width=jnp.asarray([1e-3]),
    )
    # uv.x ~ 0.95 -> red channel ~0.95 * material red (1.0)
    bc = np.asarray(props["base_color"])[0]
    assert bc[0] == pytest.approx(0.95, abs=0.05)
    assert bc[2] == pytest.approx(0.0, abs=1e-4)
