"""Budget-fallback (chunked) paths must equal their unchunked counterparts.

Round-3 post-mortem (VERDICT.md weak #1/#2): the production bench crashed in
`_rank_sort_rows`'s chunked branch because the memory-budget fallbacks fire
only at frame scale on TPU and had ZERO CPU coverage. These tests shrink each
budget via monkeypatch so every chunked branch runs on small shapes and is
asserted bit-equal (or allclose) against the dense branch.

Reference bar: the TraceRayInline hot loop the worklist sort feeds
(/root/reference/Shaders/RaytracingShared.hlsli:314-422).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nrdsample_tpu.ops import packet
from nrdsample_tpu.render import emissive_is
from nrdsample_tpu.ops.cluster import build_clusters
from nrdsample_tpu.scene import procedural


def _packed_rows(nb=64, c=24, seed=0):
    # packed worklist keys: non-negative int32, unique within a row (the
    # low cid bits make production rows unique — emulate with a permutation)
    rs = np.random.RandomState(seed)
    base = rs.randint(0, 1 << 28, size=(nb, c)).astype(np.int32) & ~np.int32(31)
    cid = np.argsort(rs.rand(nb, c), axis=1).astype(np.int32)
    return jnp.asarray(np.abs(base) | cid)


def test_rank_sort_chunked_matches_dense(monkeypatch):
    """The exact round-3 bench crash: force the chunked lax.map branch and
    require identical output to the dense rank sort (ops/packet.py:599)."""
    packed = _packed_rows()
    dense = np.asarray(packet._rank_sort_rows(packed))
    # budget of 1 byte -> chunk=1 -> every row goes through the per-row map
    monkeypatch.setattr(packet, "_RANK_SORT_BYTES_BUDGET", 1)
    chunked = np.asarray(packet._rank_sort_rows(packed))
    np.testing.assert_array_equal(dense, chunked)
    # both must actually be sorted
    assert (np.diff(chunked, axis=1) > 0).all()


def test_rank_sort_chunked_multirow_chunks(monkeypatch):
    """Budget that yields a chunk size > 1 but < nb (the production regime:
    786k-ray shadow launch at c=104)."""
    packed = _packed_rows(nb=40, c=16, seed=3)
    dense = np.asarray(packet._rank_sort_rows(packed))
    # chunk = budget // (c*c*4*4) = 7 rows -> 6 chunks incl. ragged tail
    monkeypatch.setattr(packet, "_RANK_SORT_BYTES_BUDGET", 16 * 16 * 4 * 4 * 7)
    chunked = np.asarray(packet._rank_sort_rows(packed))
    np.testing.assert_array_equal(dense, chunked)


def test_sort_worklists_chunked_under_jit(monkeypatch):
    """_sort_worklists (the production caller) must trace and run with the
    chunked rank sort under jit — the round-3 failure was a TRACE-time crash."""
    rs = np.random.RandomState(1)
    key = jnp.asarray(rs.uniform(0.1, 50.0, size=(32, 20)).astype(np.float32))
    hit = jnp.asarray(rs.rand(32, 20) > 0.4)
    ref = jax.jit(packet._sort_worklists)(key, hit)
    monkeypatch.setattr(packet, "_RANK_SORT_BYTES_BUDGET", 1)
    got = jax.jit(packet._sort_worklists)(key, hit)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage1_block_min_chunked(monkeypatch):
    """_block_min_entry's lax.map fallback (ops/packet.py:640-660) must match
    the single-shot dense entry matrix."""
    scene = procedural.cornell_box()
    cs, _, _ = build_clusters(scene.tris)
    rs = np.random.RandomState(0)
    r, block = 512, 64
    origin = jnp.asarray(rs.uniform(-1, 1, (r, 3)).astype(np.float32))
    d = rs.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    direction = jnp.asarray(d)
    t_max = jnp.full((r,), packet.T_MAX)
    dense = np.asarray(packet._block_min_entry(origin, direction, cs, t_max, block))
    monkeypatch.setattr(packet, "_STAGE1_BYTES_BUDGET", 1)
    chunked = np.asarray(packet._block_min_entry(origin, direction, cs, t_max, block))
    np.testing.assert_array_equal(dense, chunked)


def test_light_probe_chunked(monkeypatch):
    """light_probe's frame-scale chunking (render/emissive_is.py:100-124),
    incl. the ragged-tail padding path, must match the unchunked probe."""
    scene = procedural.cornell_box()
    em = emissive_is.build_emissive_set(scene)
    rs = np.random.RandomState(2)
    r = 333  # deliberately not a multiple of the shrunken chunk
    origin = jnp.asarray(rs.uniform(-0.8, 0.8, (r, 3)).astype(np.float32))
    # aim half the rays at the light so the >0 sanity check is meaningful
    target = np.asarray(em["p0"] + 0.5 * em["e1"] + 0.5 * em["e2"])
    target = target[np.asarray(em["intensity"]) > 0][:1]
    d = rs.normal(size=(r, 3)).astype(np.float32)
    d[::2] = target - np.asarray(origin)[::2]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    direction = jnp.asarray(d)
    dense = np.asarray(emissive_is.light_probe(em, origin, direction))
    monkeypatch.setattr(emissive_is, "_PROBE_CHUNK", 64)
    chunked = np.asarray(emissive_is.light_probe(em, origin, direction))
    np.testing.assert_allclose(dense, chunked, rtol=1e-6, atol=1e-6)
    assert (dense > 0).any()  # some rays actually see the cornell light
