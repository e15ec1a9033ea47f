"""Pallas à-trous wavelet chain — RELAX's edge-stopped 3x3 dilated stencil as
a fused TPU kernel.

Why: the XLA form of relax.atrous_iteration materializes a padded copy of the
packed 8-channel plane per tap (9 taps x 5 iterations), so the chain is HBM
round-trip bound and rides emitters that the r2/r3 libtpu latch degrades
(pipeline/frame.py make_staged_frame docstring). This kernel reads the packed
plane ONCE per iteration per row band into VMEM, computes all 9 edge-stopped
taps on the VPU (x-offsets via lane rolls over an edge-padded width — Mosaic
allows unaligned slicing only on the sublane axis, reproject.py note), and
writes illum+variance: ~12 channel-plane transfers per iteration instead of
~9x that.

Semantics are IDENTICAL to relax.atrous_iteration (same weights, same clamped
edges): tests/test_atrous_pallas.py asserts parity in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BAND = 64  # output rows per grid step


def _iteration_kernel(packed_hbm, out_ref, scratch, sem,
                      *, step: int, band: int, w: int, wp: int,
                      phi_l: float, phi_n: float, phi_d: float):
    """One à-trous iteration over one row band.

    packed channel order: [illum(3), variance(1), view_z(1), normal(3)];
    out channel order: [illum(3), variance(1)].
    """
    i = pl.program_id(0)
    s = step
    # halo rounded so the DMA row extent (band + 2*halo) stays 8-aligned
    # (Mosaic sublane tiling — same constraint as ops/reproject.py)
    halo = -(-s // 4) * 4
    dma = pltpu.make_async_copy(
        packed_hbm.at[:, pl.ds(i * band, band + 2 * halo), :], scratch, sem
    )
    dma.start()
    dma.wait()

    center = scratch[:, halo:halo + band, :]     # (8, band, wp)
    illum_c = center[0:3]
    var_c = center[3]
    z_c = center[4]
    n_c = center[5:8]
    lum_c = (0.2126 * illum_c[0] + 0.7152 * illum_c[1]
             + 0.0722 * illum_c[2])
    sigma_l = jnp.sqrt(jnp.maximum(var_c, 0.0) + 1e-12) * phi_l + 1e-4
    inv_sig = 1.0 / sigma_l
    abs_z = jnp.maximum(jnp.abs(z_c), 1e-3)

    acc = jnp.zeros((3, band, wp), out_ref.dtype)
    acc_var = jnp.zeros((band, wp), out_ref.dtype)
    acc_w = jnp.zeros((band, wp), out_ref.dtype)
    for iy, ky in enumerate((0.25, 0.5, 0.25)):
        dy = (iy - 1) * s
        rows = scratch[:, halo + dy:halo + dy + band, :]   # sublane slice
        for ix, kx in enumerate((0.25, 0.5, 0.25)):
            dx = (ix - 1) * s
            # lane shift: padded col x+s' maps to clamped img col x+dx'
            # (x pad is s on each side; roll wraps into the slack columns
            # past w+2s, cut by the caller's final slice). roll is circular
            # with a non-negative shift: shift = (-dx) mod wp.
            tap = pltpu.roll(rows, (-dx) % wp, 2) if dx else rows
            illum_n = tap[0:3]
            var_n = tap[3]
            z_n = tap[4]
            n_n = tap[5:8]
            lum_n = (0.2126 * illum_n[0] + 0.7152 * illum_n[1]
                     + 0.0722 * illum_n[2])
            wz = jnp.exp(-jnp.abs(z_n - z_c)
                         / (phi_d * abs_z * (abs(dy) + abs(dx) + 1e-3)))
            ndot = jnp.clip(jnp.sum(n_n * n_c, axis=0), 0.0, 1.0)
            wn = jnp.power(ndot, phi_n)
            wl = jnp.exp(-jnp.abs(lum_n - lum_c) * inv_sig)
            wgt = (ky * kx) * wz * wn * wl
            acc = acc + illum_n * wgt[None]
            acc_var = acc_var + var_n * wgt * wgt
            acc_w = acc_w + wgt
    inv = 1.0 / jnp.maximum(acc_w, 1e-6)
    out_ref[0:3] = acc * inv[None]
    out_ref[3] = acc_var * inv * inv


def atrous_iteration_pallas(illum, variance, view_z, normal, step: int,
                            s_cfg, interpret: bool = False):
    """One iteration; drop-in for relax.atrous_iteration at STATIC step."""
    h, w, _ = illum.shape
    f32 = illum.dtype
    s = int(step)
    halo = -(-s // 4) * 4
    band = min(_BAND, max(8, (h // 8) * 8))
    pad_h = (-h) % band
    packed = jnp.concatenate(
        [illum, variance[..., None], view_z[..., None], normal], axis=-1
    )
    planar = jnp.moveaxis(packed, -1, 0)                    # (8, H, W)
    wp = -(-(w + 2 * s) // 128) * 128
    planar = jnp.pad(
        planar, ((0, 0), (halo, halo + pad_h), (s, wp - w - s)), mode="edge"
    )
    hp = h + pad_h
    grid = hp // band
    out = pl.pallas_call(
        functools.partial(
            _iteration_kernel, step=s, band=band, w=w, wp=wp,
            phi_l=float(s_cfg.phi_luminance), phi_n=float(s_cfg.phi_normal),
            phi_d=float(s_cfg.phi_depth),
        ),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((4, band, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), f32),
        scratch_shapes=[
            pltpu.VMEM((8, band + 2 * halo, wp), f32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(planar)
    out = out[:, :h, s:s + w]
    return jnp.moveaxis(out[0:3], 0, -1), out[3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _iteration_diff(illum, variance, view_z, normal, step: int, s_cfg):
    """Differentiable wrapper: Pallas forward, XLA-reference backward.

    pallas_call has no automatic transpose; the inverse-rendering train step
    (pipeline/train.py) differentiates through the within-frame à-trous, so
    the VJP re-derives through relax.atrous_iteration — mathematically the
    same function (parity-tested to ~1e-5), costlier but training-only."""
    return atrous_iteration_pallas(illum, variance, view_z, normal, step, s_cfg)


def _iteration_fwd(illum, variance, view_z, normal, step, s_cfg):
    out = atrous_iteration_pallas(illum, variance, view_z, normal, step, s_cfg)
    return out, (illum, variance, view_z, normal)


def _iteration_bwd(step, s_cfg, res, ct):
    from nrdsample_tpu.denoise import relax

    illum, variance, view_z, normal = res
    _, vjp = jax.vjp(
        lambda il, va, vz, n: relax.atrous_iteration(il, va, vz, n, step, s_cfg),
        illum, variance, view_z, normal,
    )
    return vjp(ct)


_iteration_diff.defvjp(_iteration_fwd, _iteration_bwd)


def atrous_chain(illum, variance, view_z, normal, s_cfg,
                 interpret: bool = False):
    """The full chain (steps 1, 2, 4, ... 2^(n-1)), unrolled over STATIC steps
    (5 pallas_calls — each specializes its DMA halo; the XLA scan form keeps a
    max_step halo for every iteration instead). Returns (out, first_out)."""
    out, var = illum, variance
    first = None
    for i in range(s_cfg.atrous_iterations):
        if interpret:
            out, var = atrous_iteration_pallas(
                out, var, view_z, normal, 1 << i, s_cfg, interpret=True
            )
        else:
            out, var = _iteration_diff(out, var, view_z, normal, 1 << i, s_cfg)
        if i == 0:
            first = out
    return out, first
