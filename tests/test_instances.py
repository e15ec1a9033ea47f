"""Dynamic instanced scenes: transform, device-side refit, animation drivers.

Parity targets: GatherInstanceData + TLAS refit (NRDSample.cpp:3395-3630,
3907-3944), AnimatedInstance::Animate (314-332), sun/camera animation
(2017-2027, 1958-2007).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nrdsample_tpu.ops import traversal
from nrdsample_tpu.scene import animation, instances, procedural
from nrdsample_tpu.scene.types import Materials, build_triangle_soa, make_scene


def _box_scene(n_extra_boxes=0):
    """Static ground quad (instance 0) + unit box (instance 1) at origin."""
    vs, is_, ms, inst = [], [], [], []
    off = 0
    gv, gi = procedural.make_box([0, 0, -2.0], [20, 20, 0.5])
    vs.append(gv); is_.append(gi + off); off += len(gv)
    ms += [0] * len(gi); inst += [0] * len(gi)
    bv, bi = procedural.make_box([0, 0, 0], [1, 1, 1])
    vs.append(bv); is_.append(bi + off); off += len(bv)
    ms += [0] * len(bi); inst += [1] * len(bi)
    verts = np.concatenate(vs); idx = np.concatenate(is_)
    tris = build_triangle_soa(verts, idx, None, None, np.array(ms, np.int32))
    mats = Materials(
        base_color=np.ones((1, 3), np.float32) * 0.7,
        metalness=np.zeros(1, np.float32), roughness=np.ones(1, np.float32),
        emission=np.zeros((1, 3), np.float32), ior=np.full(1, 1.5, np.float32),
        flags=np.full(1, 1, np.int32),
    )
    return make_scene(tris, mats), np.array(inst, np.int32)


@pytest.mark.parametrize("mode", ["dense", "cluster"])
def test_transform_and_refit_traces_moved_geometry(mode):
    scene, inst_ids = _box_scene()
    ctx, scene2 = traversal.build_context(scene, mode=mode)
    inst = instances.assign_instance_ids(scene2, inst_ids, ctx)

    # ray straight down at x=5: misses the box at origin, hits ground
    o = jnp.asarray([[5.0, 0.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)

    def trace_at(tx):
        m = instances.identity_transforms(2)
        m = m.at[1, 0, 3].set(tx)  # move box along +x
        world = instances.transform_scene(inst, m)
        ctx2 = instances.refit_context(ctx, world)
        return traversal.closest_hit(ctx2, o, d)["t"][0]

    t_far = float(jax.jit(trace_at)(0.0))
    t_hit = float(jax.jit(trace_at)(5.0))
    assert t_far == pytest.approx(5.0 - (-1.75), abs=1e-3)  # ground top at z=-1.75
    assert t_hit == pytest.approx(5.0 - 0.5, abs=1e-3)      # box top at z=+0.5


def test_transform_rotates_normals():
    scene, inst_ids = _box_scene()
    ctx, scene2 = traversal.build_context(scene, mode="dense")
    inst = instances.assign_instance_ids(scene2, inst_ids, ctx)
    m = instances.identity_transforms(2)
    # rotate box 90 deg about x: +z normals become +y... verify unit length
    rot = jnp.asarray([[1, 0, 0], [0, 0, -1], [0, 1, 0]], jnp.float32)
    m = m.at[1, :, :3].set(rot)
    world = instances.transform_scene(inst, m)
    nrm = np.asarray(world.tris.n0)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)


def test_orbit_pool_shapes_and_periodicity():
    pool = animation.generate_orbit_pool(16, seed=3)
    m0 = animation.orbit_transforms(pool, 0.0)
    assert m0.shape == (16, 3, 4)
    # positions return after exactly one period (per-instance)
    t1 = np.asarray(pool.period)[0]
    ma = animation.orbit_transforms(pool, jnp.float32(0.0))
    # spin may differ after a period; compare orbit position only
    pa = np.asarray(ma[..., 3])
    pb = np.asarray(animation.orbit_transforms(pool, jnp.float32(t1)))[..., 3]
    np.testing.assert_allclose(pa[0], pb[0], atol=1e-3)


def test_animated_frame_jits_end_to_end():
    """Animate -> transform -> refit -> trace in ONE jitted function."""
    scene, inst_ids = _box_scene()
    ctx, scene2 = traversal.build_context(scene, mode="cluster")
    inst = instances.assign_instance_ids(scene2, inst_ids, ctx)
    pool = animation.generate_orbit_pool(2, extent=3.0, seed=1)

    @jax.jit
    def frame(t):
        m = animation.orbit_transforms(pool, t)
        world = instances.transform_scene(inst, m)
        ctx2 = instances.refit_context(ctx, world)
        o = jnp.zeros((64, 3), jnp.float32) + jnp.asarray([0.0, 0.0, 8.0])
        d = jnp.asarray(
            np.stack([
                np.linspace(-0.5, 0.5, 64),
                np.zeros(64),
                -np.ones(64),
            ], axis=-1).astype(np.float32)
        )
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return traversal.closest_hit(ctx2, o, d)["t"]

    t0 = frame(jnp.float32(0.0))
    t1 = frame(jnp.float32(1.0))
    assert np.isfinite(np.asarray(t0)).all()
    # something moved between the two frames
    assert not np.allclose(np.asarray(t0), np.asarray(t1))


def test_sun_and_camera_animation():
    az, el = animation.animate_sun(-147.0, 45.0, jnp.float32(3.0))
    assert np.isfinite(float(az)) and np.isfinite(float(el))
    eye = animation.emulate_camera_motion(
        jnp.asarray([0.0, -3.0, 1.0]), jnp.float32(1.0), mode=3
    )
    assert eye.shape == (3,)
    az0, el0 = animation.animate_sun(-147.0, 45.0, jnp.float32(0.0))
    assert float(az0) == pytest.approx(-147.0, abs=1e-4)


def test_nine_brothers_grid():
    m = animation.nine_brothers_transforms(
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]),
        jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 1.0]),
    )
    assert m.shape == (9, 3, 4)
    pos = np.asarray(m[..., 3])
    # center instance sits straight ahead
    np.testing.assert_allclose(pos[4], [0.0, 3.0, 0.0], atol=1e-5)
    # grid spans spacing*2 in x and z
    assert pos[:, 0].max() - pos[:, 0].min() == pytest.approx(2.4, abs=1e-4)


def test_prev_position_tracks_motion():
    """Xprev of a point on a translated instance maps back by the motion."""
    scene, inst_ids = _box_scene()
    ctx, scene2 = traversal.build_context(scene, mode="dense")
    inst = instances.assign_instance_ids(scene2, inst_ids, ctx)

    m_prev = instances.identity_transforms(2)
    m_curr = instances.identity_transforms(2).at[1, 0, 3].set(2.0)  # box moved +2x

    # a hit point on the box's current surface
    tri_ids = np.asarray(inst.instance_id)
    box_tri = int(np.nonzero(tri_ids == 1)[0][0])
    x = jnp.asarray([[2.5, 0.0, 0.0]])  # on the moved box
    tri = jnp.asarray([box_tri], jnp.int32)
    xp = np.asarray(instances.prev_position(inst, m_curr, m_prev, x, tri))
    np.testing.assert_allclose(xp[0], [0.5, 0.0, 0.0], atol=1e-5)

    # static ground (instance 0) keeps its position
    ground_tri = int(np.nonzero(tri_ids == 0)[0][0])
    xg = jnp.asarray([[5.0, 1.0, -1.75]])
    xp2 = np.asarray(instances.prev_position(
        inst, m_curr, m_prev, xg, jnp.asarray([ground_tri], jnp.int32)
    ))
    np.testing.assert_allclose(xp2[0], [5.0, 1.0, -1.75], atol=1e-5)

    # miss (-1) passes through
    xp3 = np.asarray(instances.prev_position(
        inst, m_curr, m_prev, xg, jnp.asarray([-1], jnp.int32)
    ))
    np.testing.assert_allclose(xp3[0], np.asarray(xg)[0], atol=1e-6)


def test_prev_position_rotation():
    scene, inst_ids = _box_scene()
    ctx, scene2 = traversal.build_context(scene, mode="dense")
    inst = instances.assign_instance_ids(scene2, inst_ids, ctx)
    rot = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    m_prev = instances.identity_transforms(2)
    m_curr = instances.identity_transforms(2).at[1, :, :3].set(rot)
    tri_ids = np.asarray(inst.instance_id)
    box_tri = int(np.nonzero(tri_ids == 1)[0][0])
    # current point = rot @ p_local; prev = p_local
    p_local = np.array([0.5, 0.25, 0.1], np.float32)
    x_curr = np.asarray(rot) @ p_local
    xp = np.asarray(instances.prev_position(
        inst, m_curr, m_prev, jnp.asarray([x_curr]), jnp.asarray([box_tri], jnp.int32)
    ))
    np.testing.assert_allclose(xp[0], p_local, atol=1e-5)
