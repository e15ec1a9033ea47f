"""Packet-kernel correctness in Pallas interpret mode (CPU-runnable).

Validates BOTH kernel variants — the VMEM-resident table and the HBM-streaming
double-buffered one — against the dense intersector on a random scene. The
streaming path is the Bistro-scale traversal (VERDICT.md next-round #1); on
hardware it is exercised by tools/profile_packet*.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.ops import intersect, packet
from nrdsample_tpu.ops.cluster import build_clusters
from nrdsample_tpu.scene import procedural


def _scene_and_rays(n_rays=512, seed=0):
    scene = procedural.shader_balls()
    cs, tris_p, _ = build_clusters(scene.tris)
    rs = np.random.RandomState(seed)
    origin = jnp.asarray(
        rs.uniform(-6, 6, (n_rays, 3)).astype(np.float32) + [0, -9, 4]
    )
    d = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    direction = jnp.asarray(d)
    return cs, tris_p, origin, direction


@pytest.mark.parametrize("stream", [False, True])
def test_packet_matches_dense(stream):
    cs, tris_p, origin, direction = _scene_and_rays()
    res = packet.closest_hit_packet(
        cs, origin, direction, interpret=True, stream=stream
    )
    ref = intersect.intersect_dense(
        origin, direction, tris_p.p0, tris_p.e1, tris_p.e2
    )
    t = np.asarray(res["t"])
    t_ref = np.asarray(ref["t"])
    # identical hit/miss classification and hit distances
    hit = t < packet.T_MAX * 0.5
    hit_ref = t_ref < packet.T_MAX * 0.5
    assert hit.sum() > 50  # the rays actually hit the scene
    np.testing.assert_array_equal(hit, hit_ref)
    np.testing.assert_allclose(t[hit], t_ref[hit], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant", [{"interleave": 2}, {"interleave": 4},
                                     {"prologue": 2}, {"prologue": 4},
                                     {"hoist": True},
                                     {"prologue": 2, "hoist": True},
                                     {"hoist": True, "single": 2},
                                     {"hoist": True, "single": 4},
                                     {"mxu": True},
                                     {"mxu": True, "hoist": True}])
def test_packet_loop_variants_match_dense(variant):
    """The interleaved-group and prologue loop structures (ROADMAP perf #1)
    must produce the same hits as the baseline per-packet loops."""
    cs, tris_p, origin, direction = _scene_and_rays(seed=2)
    res = packet.closest_hit_packet(
        cs, origin, direction, interpret=True, stream=False, **variant
    )
    ref = intersect.intersect_dense(
        origin, direction, tris_p.p0, tris_p.e1, tris_p.e2
    )
    t = np.asarray(res["t"])
    t_ref = np.asarray(ref["t"])
    hit = t < packet.T_MAX * 0.5
    hit_ref = t_ref < packet.T_MAX * 0.5
    assert hit.sum() > 50
    np.testing.assert_array_equal(hit, hit_ref)
    np.testing.assert_allclose(t[hit], t_ref[hit], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stream,hoist", [(False, False), (True, False),
                                          (False, True)])
def test_any_hit_matches_dense(stream, hoist):
    # hoist=True + stream=False is the PRODUCTION shadow-ray configuration
    # (traversal.any_hit); the any-hit early exit forces pc to 0 one trip
    # late with the hoisted prune-count, which must stay conservative
    cs, tris_p, origin, direction = _scene_and_rays(seed=1)
    t_max = jnp.full((origin.shape[0],), 8.0)
    blocked = packet.any_hit_packet(
        cs, origin, direction, t_max, interpret=True, stream=stream,
        hoist=hoist,
    )
    ref = intersect.intersect_dense(
        origin, direction, tris_p.p0, tris_p.e1, tris_p.e2
    )
    blocked_ref = (np.asarray(ref["tri"]) >= 0) & (np.asarray(ref["t"]) < 8.0)
    np.testing.assert_array_equal(np.asarray(blocked), blocked_ref)
