"""Fused Pallas TAA resolve — the post-gather stage of denoise/taa.py as one
row-band kernel.

taa.apply at 1080p measured 16.7 ms: the bicubic history gather is ~6 ms
(5 bilinear stencil taps, ops/reproject.py) and the REST — 3x3 + 5x5
neighborhood moments, variance clamp, two CIELAB conversions, mix — is ~10 ms
of XLA plane round-trips. This kernel fuses that rest: the 34 stencil taps
run on VMEM row bands, the CIELAB JND math stays in registers, and HBM sees
~9 plane reads + 3 writes.

The history gather (position-dependent) and the closest-velocity dilation
(feeds the gather) stay outside; semantics of the fused stage are IDENTICAL
to the tail of taa.apply (tests/test_taa_pallas.py, interpret mode).

Reference: Shaders/Taa.cs.hlsl:56-159 (variance clamp, CIELAB-JND mix boost).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HH = 4       # row halo (>= 2 for the 5x5 stats, multiple of 4 for DMA tiling)
_XOFF = 8     # left lane pad
_BAND = 64

_M = ((0.4124564, 0.3575761, 0.1804375),
      (0.2126729, 0.7151522, 0.0721750),
      (0.0193339, 0.1191920, 0.9503041))
_W = (0.950489, 1.0, 1.088840)


def _lab(rgb):
    """CIELAB of a (3, rows, wp) plane stack (mathlib.color.rgb_to_lab)."""
    r = jnp.maximum(rgb[0], 0.0)
    g = jnp.maximum(rgb[1], 0.0)
    b = jnp.maximum(rgb[2], 0.0)
    f = []
    for k in range(3):
        xyz = (_M[k][0] * r + _M[k][1] * g + _M[k][2] * b) / _W[k]
        # cbrt has no Mosaic lowering; the operand is clamped positive, so
        # pow(x, 1/3) is exact enough (~1e-7 rel vs cbrt)
        f.append(jnp.where(
            xyz > 0.008856,
            jnp.power(jnp.maximum(xyz, 1e-9), 1.0 / 3.0),
            7.787 * xyz + 16.0 / 116.0,
        ))
    return (116.0 * f[1] - 16.0,
            500.0 * (f[0] - f[1]),
            200.0 * (f[1] - f[2]))


def _taa_kernel(cur_hbm, aux_hbm, out_ref, cscr, ascr, sem_c, sem_a, *,
                band: int, h: int, w: int, wp: int, sigma_scale: float,
                base_mix: float, use_wide: bool):
    """cur channels: [cur3]; aux channels: [prev3, mvdx, mvdy, wide, resetmix];
    out: [out3]. resetmix: 1 where history must be dropped (reset / first
    frame), else 0 — folded host-side."""
    i = pl.program_id(0)
    d1 = pltpu.make_async_copy(
        cur_hbm.at[:, pl.ds(i * band, band + 2 * _HH), :], cscr, sem_c)
    d2 = pltpu.make_async_copy(
        aux_hbm.at[:, pl.ds(i * band, band + 2 * _HH), :], ascr, sem_a)
    d1.start()
    d2.start()
    d1.wait()
    d2.wait()

    f32 = out_ref.dtype
    cur = cscr[0:3, _HH:_HH + band, :]
    prev = ascr[0:3, _HH:_HH + band, :]
    mvdx = ascr[3, _HH:_HH + band, :]
    mvdy = ascr[4, _HH:_HH + band, :]
    wide = ascr[5, _HH:_HH + band, :]
    resetmix = ascr[6, _HH:_HH + band, :]

    # ---- neighborhood moments: 3x3 always, 5x5 under the wide mask ----
    s1 = jnp.zeros((3, band, wp), f32)
    s2 = jnp.zeros((3, band, wp), f32)
    if use_wide:
        t1 = jnp.zeros((3, band, wp), f32)
        t2 = jnp.zeros((3, band, wp), f32)
    r = 2 if use_wide else 1
    for dy in range(-r, r + 1):
        rows = cscr[0:3, _HH + dy:_HH + dy + band, :]
        for dx in range(-r, r + 1):
            tap = pltpu.roll(rows, (-dx) % wp, 2) if dx else rows
            inner = abs(dy) <= 1 and abs(dx) <= 1
            if inner:
                s1 = s1 + tap
                s2 = s2 + tap * tap
            if use_wide:
                t1 = t1 + tap
                t2 = t2 + tap * tap
    mu = s1 / 9.0
    sigma = jnp.sqrt(jnp.maximum(s2 / 9.0 - mu * mu, 0.0) + 1e-12)
    if use_wide:
        mu5 = t1 / 25.0
        sigma5 = jnp.sqrt(jnp.maximum(t2 / 25.0 - mu5 * mu5, 0.0) + 1e-12)
        wmask = wide > 0.5
        mu = jnp.where(wmask[None], mu5, mu)
        sigma = jnp.where(wmask[None], sigma5, sigma)

    # ---- variance clamp + CIELAB-JND mix (Taa.cs.hlsl:122-147) ----
    lo = mu - sigma * sigma_scale
    hi = mu + sigma * sigma_scale
    clamped = jnp.clip(prev, lo, hi)
    lp = _lab(jnp.clip(prev, 0.0, 1.0))
    lc = _lab(jnp.clip(clamped, 0.0, 1.0))
    de = jnp.sqrt((lp[0] - lc[0]) ** 2 + (lp[1] - lc[1]) ** 2
                  + (lp[2] - lc[2]) ** 2)
    jnd = jnp.clip(de / 23.0, 0.0, 1.0)
    mix = jnp.clip(base_mix + jnd * 0.5, 0.0, 1.0)

    # offscreen test on the dilated velocity (common.in_screen semantics)
    ys = jax.lax.broadcasted_iota(jnp.int32, (band, wp), 0) + i * band
    ysf = jnp.clip(ys, 0, h - 1).astype(f32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (band, wp), 1) - _XOFF
    xsf = jnp.clip(xs, 0, w - 1).astype(f32)
    px = xsf + 0.5 + mvdx
    py = ysf + 0.5 + mvdy
    offscr = (px < 0.0) | (px > w) | (py < 0.0) | (py > h)
    mix = jnp.where(offscr, 1.0, mix)
    mix = jnp.maximum(mix, resetmix)

    out_ref[0:3] = clamped + (cur - clamped) * mix[None]


def taa_resolve_pallas(cur, prev, mv_d, wide_mask, reset_mix, sigma_scale,
                       base_mix: float, interpret: bool = False):
    """Fused TAA tail: cur/prev (H, W, 3); mv_d (H, W, 2) dilated velocity;
    wide_mask (H, W) float or None; reset_mix (H, W) float in {0, 1}."""
    h, w, _ = cur.shape
    f32 = cur.dtype
    use_wide = wide_mask is not None
    if wide_mask is None:
        wide_mask = jnp.zeros((h, w), f32)
    aux = jnp.concatenate(
        [prev, mv_d, wide_mask[..., None], reset_mix[..., None]], axis=-1)

    wp = -(-(_XOFF + w + _XOFF) // 128) * 128
    band = min(_BAND, max(8, (h // 8) * 8))
    while band > 8 and (
        (10 * (band + 2 * _HH) + 24 * band) * wp * 4
    ) > (64 << 20):
        band -= 8
    pad_h = (-h) % band
    hp = h + pad_h

    def planar(a):
        p = jnp.moveaxis(a, -1, 0)
        return jnp.pad(
            p, ((0, 0), (_HH, _HH + pad_h), (_XOFF, wp - w - _XOFF)),
            mode="edge")

    out = pl.pallas_call(
        functools.partial(
            _taa_kernel, band=band, h=h, w=w, wp=wp,
            sigma_scale=float(sigma_scale), base_mix=float(base_mix),
            use_wide=use_wide,
        ),
        grid=(hp // band,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((3, band, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, hp, wp), f32),
        scratch_shapes=[
            pltpu.VMEM((3, band + 2 * _HH, wp), f32),
            pltpu.VMEM((7, band + 2 * _HH, wp), f32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(planar(cur), planar(aux))

    return jnp.moveaxis(out[:, :h, _XOFF:_XOFF + w], 0, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _resolve_diff(cur, prev, mv_d, wide_f, reset_mix, sigma_scale, base_mix):
    """Pallas forward, XLA-reference backward (pallas_call has no transpose;
    same pattern as atrous_pallas._iteration_diff)."""
    return taa_resolve_pallas(cur, prev, mv_d, wide_f, reset_mix,
                              sigma_scale, base_mix)


def _resolve_fwd(cur, prev, mv_d, wide_f, reset_mix, sigma_scale, base_mix):
    out = _resolve_diff(cur, prev, mv_d, wide_f, reset_mix, sigma_scale,
                        base_mix)
    return out, (cur, prev, mv_d, wide_f, reset_mix)


def _resolve_bwd(sigma_scale, base_mix, res, ct):
    from nrdsample_tpu.denoise import taa

    cur, prev, mv_d, wide_f, reset_mix = res
    _, vjp = jax.vjp(
        lambda c, p, m, wf, rm: taa.resolve_tail(
            c, p, m, wf, rm, sigma_scale, base_mix),
        cur, prev, mv_d, wide_f, reset_mix,
    )
    return vjp(ct)


_resolve_diff.defvjp(_resolve_fwd, _resolve_bwd)


def taa_resolve(cur, prev, mv_d, wide_f, reset_mix, sigma_scale, base_mix):
    """Differentiable fused TAA tail. wide_f may be None (no wide mask) —
    the None is static, so the two kernel specializations are distinct."""
    if wide_f is None:
        zeros = jnp.zeros(cur.shape[:2], cur.dtype)
        out = _resolve_no_wide(cur, prev, mv_d, zeros, reset_mix,
                               float(sigma_scale), float(base_mix))
        return out
    return _resolve_diff(cur, prev, mv_d, wide_f, reset_mix,
                         float(sigma_scale), float(base_mix))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _resolve_no_wide(cur, prev, mv_d, zeros, reset_mix, sigma_scale, base_mix):
    return taa_resolve_pallas(cur, prev, mv_d, None, reset_mix,
                              sigma_scale, base_mix)


def _resolve_nw_fwd(cur, prev, mv_d, zeros, reset_mix, sigma_scale, base_mix):
    out = _resolve_no_wide(cur, prev, mv_d, zeros, reset_mix, sigma_scale,
                           base_mix)
    return out, (cur, prev, mv_d, zeros, reset_mix)


def _resolve_nw_bwd(sigma_scale, base_mix, res, ct):
    from nrdsample_tpu.denoise import taa

    cur, prev, mv_d, zeros, reset_mix = res
    _, vjp = jax.vjp(
        lambda c, p, m, rm: taa.resolve_tail(
            c, p, m, None, rm, sigma_scale, base_mix),
        cur, prev, mv_d, reset_mix,
    )
    dc, dp, dm, drm = vjp(ct)
    return dc, dp, dm, jnp.zeros_like(zeros), drm


_resolve_no_wide.defvjp(_resolve_nw_fwd, _resolve_nw_bwd)
