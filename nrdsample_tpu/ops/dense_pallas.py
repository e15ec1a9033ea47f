"""Pallas dense closest-hit/any-hit for small scenes (<= _MAX_TRIS tris).

Below DENSE_CUTOFF the production traversal is ops/intersect.intersect_dense:
an (R, tile)-plane Möller-Trumbore with the triangle tile lane-padded to 128
and frame-scale launches serialized through lax.map budget chunks — at
kitchen1080 (156 tris, ~9M rays/frame) that trace phase measured 668 ms even
with IS off. This kernel is the same dense strategy in its natural TPU form:
ray blocks stream through VMEM once, a fori_loop walks the EXACT triangle
count from SMEM scalars, and the best (t, u, v, tri) is tracked in registers.
HBM traffic: 7 plane reads + 4 writes per ray, no chunk serialization.

Semantics match intersect_dense bit-for-bit (same epsilons, same first-hit
tie-break, t = t_max and tri = -1 on miss); tests/test_dense_pallas.py
asserts parity. Reference analogue: TraceRayInline over a trivially small
BLAS (RaytracingShared.hlsli:314-421).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nrdsample_tpu.ops.intersect import EPS, T_MAX

_BLOCK_ROWS = 256      # rays per grid step = _BLOCK_ROWS * 128
_MAX_TRIS = 256        # SMEM table bound (256 x 10 f32 = 10 KB)


def _kernel(tri_ref, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tm_r,
            t_out, u_out, v_out, tri_out, *, e: int):
    ox, oy, oz = ox_r[...], oy_r[...], oz_r[...]
    dx, dy, dz = dx_r[...], dy_r[...], dz_r[...]
    tm = tm_r[...]

    def body(j, carry):
        bt, bu, bv, bi = carry
        p0x, p0y, p0z = tri_ref[j, 0], tri_ref[j, 1], tri_ref[j, 2]
        e1x, e1y, e1z = tri_ref[j, 3], tri_ref[j, 4], tri_ref[j, 5]
        e2x, e2y, e2z = tri_ref[j, 6], tri_ref[j, 7], tri_ref[j, 8]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = jnp.where(
            jnp.abs(det) < EPS, 0.0, 1.0 / jnp.where(det == 0, 1.0, det)
        )
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = (
            (jnp.abs(det) >= EPS)
            & (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1.0 + 1e-6)
            & (t > 1e-5) & (t < bt)
        )
        return (jnp.where(hit, t, bt), jnp.where(hit, u, bu),
                jnp.where(hit, v, bv), jnp.where(hit, j, bi))

    init = (tm, jnp.zeros_like(tm), jnp.zeros_like(tm),
            jnp.full(tm.shape, -1, jnp.int32))
    bt, bu, bv, bi = jax.lax.fori_loop(0, e, body, init)
    t_out[...] = bt
    u_out[...] = bu
    v_out[...] = bv
    tri_out[...] = bi


def closest_hit_dense_pallas(tris, origin, direction, t_max=T_MAX,
                             interpret: bool = False) -> dict:
    """Drop-in for intersect.intersect_dense on TPU: returns
    dict(t, u, v, tri) with t = t_max / tri = -1 on miss."""
    n = origin.shape[0]
    f32 = origin.dtype
    e = int(tris.p0.shape[0])
    blk = _BLOCK_ROWS * 128
    pad = (-n) % blk
    tm = jnp.broadcast_to(jnp.asarray(t_max, f32), (n,))
    comps = [origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2], tm]
    if pad:
        comps = [jnp.concatenate([c, jnp.zeros((pad,), f32)]) for c in comps]
    rows = (n + pad) // 128
    comps = [c.reshape(rows, 128) for c in comps]
    tri_tab = jnp.concatenate(
        [tris.p0, tris.e1, tris.e2, jnp.zeros((e, 1), f32)], axis=1
    ).astype(f32)
    plane = pl.BlockSpec((_BLOCK_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    t, u, v, tri = pl.pallas_call(
        functools.partial(_kernel, e=e),
        grid=(rows // _BLOCK_ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [plane] * 7,
        out_specs=(plane, plane, plane, plane),
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), f32),
            jax.ShapeDtypeStruct((rows, 128), f32),
            jax.ShapeDtypeStruct((rows, 128), f32),
            jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        ),
        interpret=interpret,
    )(tri_tab, *comps)
    cut = lambda a: a.reshape(-1)[:n]
    return {"t": cut(t), "u": cut(u), "v": cut(v), "tri": cut(tri)}


def usable(tris) -> bool:
    return int(tris.p0.shape[0]) <= _MAX_TRIS
