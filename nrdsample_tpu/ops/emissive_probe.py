"""Pallas emissive light-probe: CastLightRay_AnyHit for the IS reservoir.

Reference: the <=16 candidate light rays per bounce of the emissive
weighted-reservoir IS (RaytracingShared.hlsli:755-827, CastLightRay_AnyHit
:283) probe a tiny emissive set (kitchen: 2 tris, interior-night: 24). The
XLA dense path (ops/intersect.intersect_dense) pads the triangle tile to 128
lanes (up to 64x wasted MT tests), chunks frame-scale launches through
lax.map (64 serial chunks at 1080p x 16 candidates), and pays a lane-padded
one-hot dot for the intensity gather — measured 718 ms of kitchen1080's
1386 ms trace phase.

This kernel streams ray blocks through VMEM once, unrolls the EXACT emissive
count E from SMEM scalars (no padding waste), and tracks the winning
intensity in-register (no gather): HBM traffic is 6 reads + 1 write per ray.

Semantics match intersect_dense + the intensity select in
emissive_is.light_probe exactly (same epsilons, same closest-hit tie-break);
tests/test_emissive_probe.py asserts parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nrdsample_tpu.ops.intersect import EPS, T_MAX

_BLOCK_ROWS = 256          # rays per grid step = _BLOCK_ROWS * 128
_MAX_UNROLL_E = 256        # beyond this, fall back to the dense/packet paths


def _probe_kernel(tri_ref, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, li_ref,
                  *, e: int):
    """One ray block vs all E triangles. tri_ref: (E, 10) SMEM rows
    [p0(3), e1(3), e2(3), intensity]."""
    ox, oy, oz = ox_r[...], oy_r[...], oz_r[...]
    dx, dy, dz = dx_r[...], dy_r[...], dz_r[...]
    t_best = jnp.full(ox.shape, T_MAX, ox.dtype)
    li = jnp.zeros(ox.shape, ox.dtype)
    for j in range(e):
        p0x, p0y, p0z = tri_ref[j, 0], tri_ref[j, 1], tri_ref[j, 2]
        e1x, e1y, e1z = tri_ref[j, 3], tri_ref[j, 4], tri_ref[j, 5]
        e2x, e2y, e2z = tri_ref[j, 6], tri_ref[j, 7], tri_ref[j, 8]
        inten = tri_ref[j, 9]
        # Möller-Trumbore, component form (ops/intersect._mt_intersect)
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
            & (t > 1e-5) & (t < t_best)
        )
        t_best = jnp.where(hit, t, t_best)
        li = jnp.where(hit, inten, li)
    li_ref[...] = li


def light_probe_pallas(em: dict, origin: jnp.ndarray, direction: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Intensity of the nearest emissive surface along each ray (0 on miss).
    origin/direction: (N, 3); em from emissive_is.build_emissive_set (invalid
    slots have degenerate zero edges -> always miss, intensity 0)."""
    n = origin.shape[0]
    f32 = origin.dtype
    e = int(em["p0"].shape[0])
    blk = _BLOCK_ROWS * 128
    pad = (-n) % blk
    comps = [origin[:, 0], origin[:, 1], origin[:, 2],
             direction[:, 0], direction[:, 1], direction[:, 2]]
    if pad:
        comps = [jnp.concatenate([c, jnp.zeros((pad,), f32)]) for c in comps]
    rows = (n + pad) // 128
    comps = [c.reshape(rows, 128) for c in comps]
    tri = jnp.concatenate(
        [em["p0"], em["e1"], em["e2"], em["intensity"][:, None]], axis=1
    ).astype(f32)                                              # (E, 10)
    grid = rows // _BLOCK_ROWS
    plane = pl.BlockSpec((_BLOCK_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_probe_kernel, e=e),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [plane] * 6,
        out_specs=plane,
        out_shape=jax.ShapeDtypeStruct((rows, 128), f32),
        interpret=interpret,
    )(tri, *comps)
    return out.reshape(-1)[:n]


def usable(em: dict) -> bool:
    """Static gate: Pallas probe covers dense small-set emissive tables."""
    return "clusters" not in em and int(em["p0"].shape[0]) <= _MAX_UNROLL_E
