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


def test_super_worklists_conservative():
    """Two-level (supercluster-sorted) stage-1 must be CONSERVATIVE vs the
    flat exact path: every flat-hit cluster appears within the super
    worklist's count, with an ascending keys row whose key at that cluster is
    a lower bound of the flat key (round-5 sort rework: the 8x-narrower
    supercluster sort replaced the C-wide row sort that dominated exterior
    launches)."""
    scene = procedural.random_soup(40_000)
    cs, tris_p, _ = build_clusters(scene.tris)
    rs = np.random.RandomState(3)
    n_rays = 512
    origin = jnp.asarray(rs.uniform(-40, 40, (n_rays, 3)).astype(np.float32))
    d = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    direction = jnp.asarray(d)
    tm = jnp.full((n_rays,), packet.T_MAX, jnp.float32)
    block = 128

    from nrdsample_tpu.ops.cluster import SUPER_SIZE
    o_f, k_f, c_f = packet._block_worklists(origin, direction, cs, tm, block)
    o_s, k_s, c_s = packet._block_worklists_super(
        origin, direction, cs, tm, block, expand=False)
    # expand super entries to member cluster ids for the coverage check
    o_s = (np.asarray(o_s)[:, :, None] * SUPER_SIZE
           + np.arange(SUPER_SIZE)).reshape(o_s.shape[0], -1)
    k_s = np.repeat(np.asarray(k_s), SUPER_SIZE, axis=1)
    c_s = np.asarray(c_s) * SUPER_SIZE
    o_f, k_f, c_f = map(np.asarray, (o_f, k_f, c_f))

    nb = n_rays // block
    for b in range(nb):
        # keys ascending (the kernel's count-below-horizon prune requires
        # it); direct comparison, not np.diff — inf - inf is NaN
        assert (k_s[b, 1:] >= k_s[b, :-1] - 1e-6).all()
        flat_hits = set(o_f[b, :c_f[b]].tolist())
        super_hits = set(o_s[b, :c_s[b]].tolist())
        missing = flat_hits - super_hits
        assert not missing, f"block {b}: flat-hit clusters missing {missing}"
        # replicated supercluster keys are lower bounds of the flat keys
        flat_key = {int(cid): k_f[b, i] for i, cid in enumerate(o_f[b, :c_f[b]])}
        for i, cid in enumerate(o_s[b, :c_s[b]]):
            if int(cid) in flat_key:
                assert k_s[b, i] <= flat_key[int(cid)] + 1e-3


def test_stream_super_walk_matches_dense(monkeypatch):
    """Supercluster-granular streaming walk (members=SUPER_SIZE: one DMA per
    super, straight-line member tests) must match the dense intersector.
    The flat-worklist threshold is patched down to force the super path on a
    small scene (interpret mode)."""
    monkeypatch.setattr(packet, "FLAT_WORKLIST_MAX_C", 4)
    monkeypatch.setattr(packet, "SUPER_WALK_STREAM", True)
    scene = procedural.random_soup(30_000)
    cs, tris_p, _ = build_clusters(scene.tris)
    assert cs.count > 4
    rs = np.random.RandomState(11)
    n_rays = 256
    origin = jnp.asarray(rs.uniform(-40, 40, (n_rays, 3)).astype(np.float32))
    d = rs.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    direction = jnp.asarray(d)

    res = packet.closest_hit_packet(
        cs, origin, direction, block=128, interpret=True, stream=True)
    dense = intersect.intersect_dense(
        origin, direction, tris_p.p0, tris_p.e1, tris_p.e2)
    np.testing.assert_allclose(
        np.asarray(res["t"]), np.asarray(dense["t"]), rtol=1e-4, atol=1e-4)
    hit_p = np.asarray(res["tri"]) >= 0
    hit_d = np.asarray(dense["tri"]) >= 0
    np.testing.assert_array_equal(hit_p, hit_d)
