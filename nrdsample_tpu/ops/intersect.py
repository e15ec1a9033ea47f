"""Ray-triangle intersection: Möller–Trumbore, batched.

Two entry points:
  * `intersect_dense`  — every ray vs every triangle, tiled; the speed-of-light
    path for small/medium scenes (all work is dense VPU math, zero divergence).
  * `intersect_gathered` — every ray vs its own K gathered triangles (leaf tests
    inside BVH traversal).

Replaces the hardware rayQuery.Proceed() loop (RaytracingShared.hlsli:314-421).
Hit *selection* is discrete and therefore detached from autodiff; shading
recomputes differentiable quantities from the detached hit (SURVEY.md §7.1
"Differentiability").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7
T_MAX = 1e5  # matches INF (Shared.hlsli:141)


def _mt_intersect(o, d, p0, e1, e2):
    """Möller–Trumbore core. All args broadcast to [..., 3].

    Returns (t, u, v, hit): hit requires t in (EPS_t, inf) and barycentrics valid.
    Backface hits are reported (two-sided, like the reference's opaque traversal
    which does not cull backfaces — RayFlags = PT_RAY_FLAGS = 0)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) < EPS, 0.0, 1.0 / jnp.where(det == 0, 1.0, det))
    tvec = o - p0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) >= EPS)
        & (u >= -1e-6)
        & (v >= -1e-6)
        & (u + v <= 1.0 + 1e-6)
        & (t > 1e-5)
    )
    return t, u, v, hit


def intersect_dense(origin: jnp.ndarray, direction: jnp.ndarray,
                    p0: jnp.ndarray, e1: jnp.ndarray, e2: jnp.ndarray,
                    t_max=T_MAX, tile: int = 2048):
    """Closest-hit of R rays against T triangles, O(R*T) dense.

    origin/direction: (R, 3); p0/e1/e2: (T, 3).
    Returns dict(t, u, v, tri) with tri = -1 on miss. The triangle loop is a
    `lax.scan` over tiles of `tile` triangles so VMEM working sets stay bounded
    and XLA pipelines the HBM streams.
    """
    r = origin.shape[0]
    t_count = p0.shape[0]
    pad = (-t_count) % tile
    if pad:
        padz = lambda a: jnp.concatenate([a, jnp.zeros((pad, 3), a.dtype)], axis=0)
        p0, e1, e2 = padz(p0), padz(e1), padz(e2)
    n_tiles = (t_count + pad) // tile
    p0t = p0.reshape(n_tiles, tile, 3)
    e1t = e1.reshape(n_tiles, tile, 3)
    e2t = e2.reshape(n_tiles, tile, 3)

    init = (
        jnp.full((r,), t_max, origin.dtype),
        jnp.zeros((r,), origin.dtype),
        jnp.zeros((r,), origin.dtype),
        jnp.full((r,), -1, jnp.int32),
    )

    def body(carry, tile_data):
        best_t, best_u, best_v, best_i = carry
        tp0, te1, te2, base = tile_data
        t, u, v, hit = _mt_intersect(
            origin[:, None, :], direction[:, None, :],
            tp0[None, :, :], te1[None, :, :], te2[None, :, :],
        )  # (R, tile)
        t = jnp.where(hit, t, t_max)
        # padded triangles are degenerate (zero e1/e2) -> det≈0 -> miss
        arg = jnp.argmin(t, axis=-1)
        tmin = jnp.take_along_axis(t, arg[:, None], axis=-1)[:, 0]
        umin = jnp.take_along_axis(u, arg[:, None], axis=-1)[:, 0]
        vmin = jnp.take_along_axis(v, arg[:, None], axis=-1)[:, 0]
        closer = tmin < best_t
        best_u = jnp.where(closer, umin, best_u)
        best_v = jnp.where(closer, vmin, best_v)
        best_i = jnp.where(closer, base + arg.astype(jnp.int32), best_i)
        best_t = jnp.where(closer, tmin, best_t)
        return (best_t, best_u, best_v, best_i), None

    bases = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    (bt, bu, bv, bi), _ = jax.lax.scan(body, init, (p0t, e1t, e2t, bases))
    return {"t": bt, "u": bu, "v": bv, "tri": bi}


def occluded_dense(origin: jnp.ndarray, direction: jnp.ndarray,
                   p0: jnp.ndarray, e1: jnp.ndarray, e2: jnp.ndarray,
                   t_max, tile: int = 2048) -> jnp.ndarray:
    """Any-hit visibility: True where the segment [0, t_max] is blocked.

    The CastVisibilityRay_AnyHit equivalent (RaytracingShared.hlsli:249-264).
    """
    r = origin.shape[0]
    t_count = p0.shape[0]
    pad = (-t_count) % tile
    if pad:
        padz = lambda a: jnp.concatenate([a, jnp.zeros((pad, 3), a.dtype)], axis=0)
        p0, e1, e2 = padz(p0), padz(e1), padz(e2)
    n_tiles = (t_count + pad) // tile
    p0t = p0.reshape(n_tiles, tile, 3)
    e1t = e1.reshape(n_tiles, tile, 3)
    e2t = e2.reshape(n_tiles, tile, 3)
    t_max = jnp.broadcast_to(jnp.asarray(t_max), (r,))

    def body(blocked, tile_data):
        tp0, te1, te2 = tile_data
        t, _, _, hit = _mt_intersect(
            origin[:, None, :], direction[:, None, :],
            tp0[None, :, :], te1[None, :, :], te2[None, :, :],
        )
        any_hit = jnp.any(hit & (t < t_max[:, None]), axis=-1)
        return blocked | any_hit, None

    blocked, _ = jax.lax.scan(body, jnp.zeros((r,), bool), (p0t, e1t, e2t))
    return blocked


def intersect_gathered(o, d, p0, e1, e2):
    """Rays vs per-ray gathered triangles: o/d (..., 3), p0/e1/e2 (..., K, 3).

    Returns (t, u, v, hit) each (..., K)."""
    return _mt_intersect(o[..., None, :], d[..., None, :], p0, e1, e2)
