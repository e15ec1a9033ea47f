"""BVH8 traversal — the TraceRayInline replacement (SURVEY.md §7.3 hard part #1).

Design: breadth-vectorized 8-wide traversal. Each ray runs a `lax.while_loop`
with a short stack; per step it pops one node and slab-tests all 8 children at
once (vectorizing over children in-lane and over the ray batch via `vmap`), then
tests up to WIDTH leaf ranges of LEAF_SIZE triangles. Children are pushed
far-to-near so the nearest is popped first, enabling t-based culling.

For scenes below `DENSE_CUTOFF` triangles the dense intersector wins outright
(zero divergence, pure VPU), so `trace` dispatches on static triangle count.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nrdsample_tpu.ops import intersect
from nrdsample_tpu.scene.bvh import BVH8, LEAF_SIZE, decode_leaf

T_MAX = intersect.T_MAX
DENSE_CUTOFF = 1024     # tris; below this, dense beats traversal on TPU
STACK_DEPTH = 64


def _slab_test(o, inv_d, t_best, cmin, cmax):
    """Ray vs 8 AABBs: o/inv_d (3,), cmin/cmax (8, 3) -> (tnear (8,), hit (8,))."""
    t0 = (cmin - o) * inv_d
    t1 = (cmax - o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    tnear = jnp.maximum(jnp.max(tmin, axis=-1), 0.0)
    tfar = jnp.min(tmax, axis=-1)
    hit = (tnear <= tfar) & (tnear < t_best)
    return tnear, hit


def _traverse_one(o, d, bvh: BVH8, tri_p0, tri_e1, tri_e2, t_max):
    """Closest-hit traversal for a single ray (vmapped over the batch)."""
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)

    stack = jnp.zeros((STACK_DEPTH,), jnp.int32)
    sp = jnp.int32(1)  # root pushed
    best = (jnp.asarray(t_max, jnp.float32), jnp.float32(0), jnp.float32(0), jnp.int32(-1))

    def cond(state):
        sp, _, _ = state
        return sp > 0

    def body(state):
        sp, stack, best = state
        node = stack[sp - 1]
        sp = sp - 1
        t_best = best[0]

        cmin = bvh.child_min[node]     # (8, 3)
        cmax = bvh.child_max[node]
        meta = bvh.child_meta[node]    # (8,)
        tnear, boxhit = _slab_test(o, inv_d, t_best, cmin, cmax)
        boxhit = boxhit & (meta != -1)

        is_leaf = meta <= -2
        # --- leaf triangles: gather up to 8 leaves * LEAF_SIZE tris, test all ---
        lstart, lcount = decode_leaf(meta)
        leafhit = boxhit & is_leaf
        # (8, LEAF_SIZE) triangle ids; invalid -> 0 with mask
        offs = jnp.arange(LEAF_SIZE, dtype=jnp.int32)
        tri_ids = lstart[:, None] + offs[None, :]
        valid = leafhit[:, None] & (offs[None, :] < lcount[:, None])
        tri_ids = jnp.where(valid, tri_ids, 0)
        tp0 = tri_p0[tri_ids]  # (8, LEAF_SIZE, 3)
        te1 = tri_e1[tri_ids]
        te2 = tri_e2[tri_ids]
        t, u, v, hit = intersect._mt_intersect(
            o[None, None, :], d[None, None, :], tp0, te1, te2
        )
        hit = hit & valid & (t < t_best)
        t = jnp.where(hit, t, T_MAX)
        flat = jnp.argmin(t.ravel())
        tmin = t.ravel()[flat]
        closer = tmin < t_best
        best = (
            jnp.where(closer, tmin, best[0]),
            jnp.where(closer, u.ravel()[flat], best[1]),
            jnp.where(closer, v.ravel()[flat], best[2]),
            jnp.where(closer, tri_ids.ravel()[flat], best[3]),
        )

        # --- push internal children, far first ---
        push = boxhit & (meta >= 0)
        # sort by tnear descending so nearest ends on top of the stack
        order = jnp.argsort(-tnear)
        meta_s = meta[order]
        push_s = push[order]
        cnt = jnp.cumsum(push_s.astype(jnp.int32)) - push_s.astype(jnp.int32)
        pos = jnp.where(push_s, sp + cnt, STACK_DEPTH - 1)
        pos = jnp.minimum(pos, STACK_DEPTH - 1)
        stack = stack.at[pos].set(jnp.where(push_s, meta_s, stack[pos]))
        sp = jnp.minimum(sp + jnp.sum(push_s.astype(jnp.int32)), STACK_DEPTH - 1)
        return sp, stack, best

    _, _, best = jax.lax.while_loop(cond, body, (sp, stack, best))
    t, u, v, tri = best
    return {"t": t, "u": u, "v": v, "tri": tri}


def traverse_bvh8(origin, direction, bvh: BVH8, tri_p0, tri_e1, tri_e2, t_max=T_MAX):
    """Batched closest-hit: origin/direction (R, 3) -> dict of (R,) results."""
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), origin.shape[:1])
    return jax.vmap(
        lambda o, d, tm: _traverse_one(o, d, bvh, tri_p0, tri_e1, tri_e2, tm)
    )(origin, direction, t_max)


def _occluded_one(o, d, bvh: BVH8, tri_p0, tri_e1, tri_e2, t_max):
    """Any-hit traversal for one ray: early-exits when any hit < t_max is found."""
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, jnp.where(d >= 0, 1e-12, -1e-12), d)
    stack = jnp.zeros((STACK_DEPTH,), jnp.int32)

    def cond(state):
        sp, _, blocked = state
        return (sp > 0) & jnp.logical_not(blocked)

    def body(state):
        sp, stack, blocked = state
        node = stack[sp - 1]
        sp = sp - 1
        cmin = bvh.child_min[node]
        cmax = bvh.child_max[node]
        meta = bvh.child_meta[node]
        tnear, boxhit = _slab_test(o, inv_d, t_max, cmin, cmax)
        boxhit = boxhit & (meta != -1)

        is_leaf = meta <= -2
        lstart, lcount = decode_leaf(meta)
        leafhit = boxhit & is_leaf
        offs = jnp.arange(LEAF_SIZE, dtype=jnp.int32)
        tri_ids = lstart[:, None] + offs[None, :]
        valid = leafhit[:, None] & (offs[None, :] < lcount[:, None])
        tri_ids = jnp.where(valid, tri_ids, 0)
        t, _, _, hit = intersect._mt_intersect(
            o[None, None, :], d[None, None, :],
            tri_p0[tri_ids], tri_e1[tri_ids], tri_e2[tri_ids],
        )
        blocked = blocked | jnp.any(hit & valid & (t < t_max))

        push = boxhit & (meta >= 0)
        cnt = jnp.cumsum(push.astype(jnp.int32)) - push.astype(jnp.int32)
        pos = jnp.where(push, sp + cnt, STACK_DEPTH - 1)
        pos = jnp.minimum(pos, STACK_DEPTH - 1)
        stack = stack.at[pos].set(jnp.where(push, meta, stack[pos]))
        sp = jnp.minimum(sp + jnp.sum(push.astype(jnp.int32)), STACK_DEPTH - 1)
        return sp, stack, blocked

    _, _, blocked = jax.lax.while_loop(
        cond, body, (jnp.int32(1), stack, jnp.bool_(False))
    )
    return blocked


def occluded_bvh8(origin, direction, bvh: BVH8, tri_p0, tri_e1, tri_e2, t_max):
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), origin.shape[:1])
    return jax.vmap(
        lambda o, d, tm: _occluded_one(o, d, bvh, tri_p0, tri_e1, tri_e2, tm)
    )(origin, direction, t_max)


# ---------------------------------------------------------------------------
# Unified tracing entry points (dense vs BVH dispatch on static scene size)
# ---------------------------------------------------------------------------

class TraceContext:
    """Static wrapper bundling the acceleration data for a scene.

    Built once per scene (host); holds the BVH8 only when the scene is large
    enough to need it. The reference analogue is the TLAS pair + instance
    buffers bound in SET_RAY_TRACING (RaytracingShared.hlsli:3-16).
    """

    def __init__(self, tris, bvh: BVH8 | None):
        self.tris = tris
        self.bvh = bvh

    @property
    def use_dense(self) -> bool:
        return self.bvh is None


def build_context(tris, force_dense: bool | None = None) -> "TraceContext":
    import numpy as np

    from nrdsample_tpu.scene.bvh import build_bvh8, reorder_tris

    n = tris.count
    dense = (n <= DENSE_CUTOFF) if force_dense is None else force_dense
    if dense:
        return TraceContext(tris, None)
    bvh, order = build_bvh8(
        np.asarray(tris.p0), np.asarray(tris.e1), np.asarray(tris.e2)
    )
    tris = reorder_tris(tris, order)
    return TraceContext(tris, bvh)


def closest_hit(ctx: TraceContext, origin, direction, t_max=T_MAX):
    """Closest-hit dispatch. Hit results are detached (non-differentiable
    decisions, SURVEY.md §7.1); shading recomputes continuous quantities."""
    tr = ctx.tris
    o = jax.lax.stop_gradient(origin)
    d = jax.lax.stop_gradient(direction)
    if ctx.use_dense:
        return intersect.intersect_dense(o, d, tr.p0, tr.e1, tr.e2, t_max=t_max)
    return traverse_bvh8(o, d, ctx.bvh, tr.p0, tr.e1, tr.e2, t_max=t_max)


def any_hit(ctx: TraceContext, origin, direction, t_max):
    tr = ctx.tris
    o = jax.lax.stop_gradient(origin)
    d = jax.lax.stop_gradient(direction)
    if ctx.use_dense:
        return intersect.occluded_dense(o, d, tr.p0, tr.e1, tr.e2, t_max=t_max)
    return occluded_bvh8(o, d, ctx.bvh, tr.p0, tr.e1, tr.e2, t_max=t_max)
