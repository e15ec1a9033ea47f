"""Leaf translucency in ray generation (RaytracingShared.hlsli:728, :866-878):
diffuse samples on FLAG_LEAF geometry flip through the surface with
probability LEAF_TRANSLUCENCY and carry the chlorophyll-tinted 1/p weight;
non-leaf geometry and use_translucency=False are unaffected."""

import numpy as np
import jax.numpy as jnp

from nrdsample_tpu import config as cfgmod
from nrdsample_tpu.mathlib import geometry as geo
from nrdsample_tpu.render.trace_opaque import generate_ray_and_update_throughput

N = 4096


def _props(flags_val: int):
    n = jnp.zeros((N, 3), jnp.float32).at[:, 2].set(1.0)
    v = geo.normalize(jnp.tile(jnp.array([[0.3, 0.1, 0.9]], jnp.float32), (N, 1)))
    return {
        "n": n, "n_geom": n, "v": v,
        "base_color": jnp.full((N, 3), 0.5, jnp.float32),
        "metalness": jnp.zeros((N,), jnp.float32),
        "roughness": jnp.full((N,), 0.8, jnp.float32),
        "flags": jnp.full((N,), flags_val, jnp.int32),
    }


def _gen(flags_val, use_translucency):
    props = _props(flags_val)
    thr = jnp.ones((N, 3), jnp.float32)
    pix = jnp.arange(N, dtype=jnp.int32)
    return generate_ray_and_update_throughput(
        props, thr, jnp.ones((N,), bool), pix, jnp.int32(7), 100,
        use_translucency=use_translucency,
    )


def test_leaf_transmits_at_expected_rate_with_1_over_p_weight():
    ray, thr, _, trans = _gen(cfgmod.FLAG_NON_TRANSPARENT | cfgmod.FLAG_LEAF, True)
    rate = float(jnp.mean(trans.astype(jnp.float32)))
    assert abs(rate - cfgmod.LEAF_TRANSLUCENCY) < 0.03, rate
    # transmitted rays point through the surface (z < 0)
    assert bool(jnp.all(ray[trans][:, 2] < 0.0))
    # weight = albedo^1.2 / p, identical across the transmitted set
    expected = 0.5 ** 1.2 / cfgmod.LEAF_TRANSLUCENCY
    np.testing.assert_allclose(np.asarray(thr[trans]), expected, rtol=1e-5)
    # reflected leaf samples carry the 1/(1-p) survivor compensation:
    # mean total energy stays finite and positive
    assert bool(jnp.all(jnp.isfinite(thr)))


def test_non_leaf_never_transmits():
    ray, _, _, trans = _gen(cfgmod.FLAG_NON_TRANSPARENT, True)
    assert not bool(jnp.any(trans))
    assert bool(jnp.all(ray[:, 2] >= 0.0))


def test_disabled_translucency_never_transmits():
    _, _, _, trans = _gen(cfgmod.FLAG_NON_TRANSPARENT | cfgmod.FLAG_LEAF, False)
    assert not bool(jnp.any(trans))
