"""Pallas small-scene dense closest-hit == intersect_dense (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.ops import dense_pallas, intersect
from nrdsample_tpu.scene import procedural


def _scene_rays(scene_fn, n=4000, seed=0, spread=3.0):
    scene = scene_fn()
    rs = np.random.RandomState(seed)
    o = jnp.asarray(rs.uniform(-spread, spread, (n, 3)).astype(np.float32))
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return scene.tris, o, jnp.asarray(d)


@pytest.mark.parametrize("scene_fn", [procedural.cornell_box,
                                      procedural.kitchen])
def test_matches_intersect_dense(scene_fn):
    tris, o, d = _scene_rays(scene_fn)
    assert dense_pallas.usable(tris)
    ref = intersect.intersect_dense(o, d, tris.p0, tris.e1, tris.e2)
    got = dense_pallas.closest_hit_dense_pallas(tris, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(ref["tri"]))
    hit = np.asarray(ref["tri"]) >= 0
    assert hit.sum() > 100
    for k in ("t", "u", "v"):
        np.testing.assert_allclose(np.asarray(got[k])[hit],
                                   np.asarray(ref[k])[hit],
                                   rtol=1e-6, atol=1e-6)
    # miss sentinel: t = t_max
    np.testing.assert_allclose(np.asarray(got["t"])[~hit], intersect.T_MAX)


def test_bounded_t_max_and_tail():
    tris, o, d = _scene_rays(procedural.cornell_box, n=777, seed=2)
    tm = jnp.full((777,), 1.5, jnp.float32)
    ref = intersect.intersect_dense(o, d, tris.p0, tris.e1, tris.e2, t_max=tm)
    got = dense_pallas.closest_hit_dense_pallas(tris, o, d, t_max=tm,
                                                interpret=True)
    np.testing.assert_array_equal(np.asarray(got["tri"]), np.asarray(ref["tri"]))
    np.testing.assert_allclose(np.asarray(got["t"]), np.asarray(ref["t"]),
                               rtol=1e-6, atol=1e-6)


def test_any_hit_equivalence():
    tris, o, d = _scene_rays(procedural.cornell_box, n=1000, seed=3)
    tm = jnp.full((1000,), 2.0, jnp.float32)
    ref = np.asarray(intersect.occluded_dense(o, d, tris.p0, tris.e1, tris.e2,
                                              t_max=tm))
    got = dense_pallas.closest_hit_dense_pallas(tris, o, d, t_max=tm,
                                                interpret=True)
    blocked = (np.asarray(got["tri"]) >= 0) & (np.asarray(got["t"]) < 2.0)
    np.testing.assert_array_equal(blocked, ref)
