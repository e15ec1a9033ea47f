"""Fused Pallas temporal-accumulation kernel for RELAX.

The XLA form of the taccum block (anti_firefly -> history gather ->
disocclusion -> accumulate -> estimate_variance) costs ~10 ms of the 17.5 ms
1080p RELAX signal: every stencil/elementwise stage round-trips its planes
through HBM, and the history gather runs as the 2-stage bounded-displacement
stencil (ops/reproject.py) with a (2d+1)-pass V intermediate.

This kernel does the whole block in ONE pass over row bands: the history
planes are DMA'd once per band, the bilinear gather runs as an in-VMEM
(2d+1)^2 tent stencil (d=4; guarded by max|mv| < 3 at the call site, which
keeps the nonzero tent support in [-3, 3] — 49 taps), and the disocclusion /
accumulation / moments / 3x3 spatial-variance / anti-firefly math stays in
VMEM. HBM traffic: ~21 channel-plane reads + 7 writes total, vs ~60+ for the
XLA composition.

Semantics are IDENTICAL to
    illum' = common.anti_firefly(illum)
    acc, m, f, hist' = relax.temporal_accumulate(hist, illum', ...)
    var = relax.estimate_variance(acc, m, f)
including clamp-to-edge behavior at image borders (pad pixels replicate the
edge pixel bit-exactly: their row/col indices are clamped before the position
math, so they compute the edge pixel's value). Parity:
tests/test_taccum_pallas.py (interpret mode).

Reference: NRD RELAX temporal accumulation (SURVEY.md §2.3 NRD row;
NRDSample.cpp:543-561 settings surface).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_D = 4        # displacement bound; callers guard max|mv_xy| < _D - 1
_HH = 8       # row halo (multiple of 4 >= _D + 2: gather + variance stencils)
_XOFF = 8     # left lane pad (>= _D + 1 for the firefly/variance x-taps)
_BAND = 32    # output rows per grid step

_LR, _LG, _LB = 0.2126, 0.7152, 0.0722


def _lum(rgb):
    return _LR * rgb[0] + _LG * rgb[1] + _LB * rgb[2]


def _taccum_kernel(hist_hbm, cur_hbm, mf_ref, out_ref, hscr, cscr, sem_h,
                   sem_c, *, band: int, h: int, w: int, wp: int,
                   thr: float, anti_ff: bool):
    """One row band. hist channels: [illum3, m1, m2, viewZ, normal3, frames];
    cur channels: [illum3, viewZ, normal3, mvx, mvy, mvz, confidence];
    out channels: [acc_illum3, m1, m2, frames, variance]."""
    i = pl.program_id(0)
    d1 = pltpu.make_async_copy(
        hist_hbm.at[:, pl.ds(i * band, band + 2 * _HH), :], hscr, sem_h)
    d2 = pltpu.make_async_copy(
        cur_hbm.at[:, pl.ds(i * band, band + 2 * _HH), :], cscr, sem_c)
    d1.start()
    d2.start()
    d1.wait()
    d2.wait()

    f32 = out_ref.dtype
    e0 = _HH - 1          # ext region = output rows +- 1 (variance stencil)
    ext = band + 2

    il = cscr[0:3, e0:e0 + ext, :]
    vz = cscr[3, e0:e0 + ext, :]
    nrm = cscr[4:7, e0:e0 + ext, :]
    mvx = cscr[7, e0:e0 + ext, :]
    mvy = cscr[8, e0:e0 + ext, :]
    mvz = cscr[9, e0:e0 + ext, :]
    conf = cscr[10, e0:e0 + ext, :]

    # ---- anti-firefly (RCRS luminance clamp, 8 neighbors) ----
    if anti_ff:
        lum_f = _lum(cscr[0:3, e0 - 1:e0 + ext + 1, :])   # (ext+2, wp)
        nmin = None
        nmax = None
        for dy in (-1, 0, 1):
            rows = lum_f[1 + dy:1 + dy + ext]
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                tap = pltpu.roll(rows, (-dx) % wp, 1) if dx else rows
                nmin = tap if nmin is None else jnp.minimum(nmin, tap)
                nmax = tap if nmax is None else jnp.maximum(nmax, tap)
        lum_c = lum_f[1:1 + ext]
        scale = jnp.clip(lum_c, nmin, nmax) / jnp.maximum(lum_c, 1e-9)
        ilff = il * scale[None]
    else:
        ilff = il

    # ---- positions. Pad pixels must replicate their edge pixel EXACTLY (the
    # variance/firefly taps read them, and the XLA reference clamps to edge):
    # the sample position is computed from the CLAMPED coordinate (so it
    # equals the edge pixel's), while the tent displacement is measured from
    # the ACTUAL row/col — the clamp delta shifts the tent onto the same
    # absolute rows the edge pixel samples. That widens the tent support at
    # pad pixels to |disp| < 4, hence the 9x9 tap range below. ----
    ys = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 0) + (i * band - 1)
    ysf = jnp.clip(ys, 0, h - 1).astype(f32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (ext, wp), 1) - _XOFF
    xsf = jnp.clip(xs, 0, w - 1).astype(f32)
    posx = xsf + 0.5 + mvx
    posy = ysf + 0.5 + mvy
    inscr = ((posx >= 0.0) & (posx <= w) & (posy >= 0.0)
             & (posy <= h)).astype(f32)
    dx = jnp.clip(posx, 0.5, w - 0.5) - (xs.astype(f32) + 0.5)
    dy = jnp.clip(posy, 0.5, h - 0.5) - (ys.astype(f32) + 0.5)

    # ---- bilinear history gather as a 9x9 tent stencil ----
    wys = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy)) for oy in range(-4, 5)]
    # tap rows span [e0-4, e0+ext+4) = [3, band+13): materialize once, roll per ox
    hs = hscr[:, 3:3 + band + 10, :]
    acc = jnp.zeros((10, ext, wp), f32)
    for ox in range(-4, 5):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox))
        rolled = pltpu.roll(hs, (-ox) % wp, 2) if ox else hs
        for k, oy in enumerate(range(-4, 5)):
            wgt = (wx * wys[k])[None]
            acc = acc + rolled[:, 4 + oy:4 + oy + ext, :] * wgt

    prev_il = acc[0:3]
    prev_m1 = acc[3]
    prev_m2 = acc[4]
    prev_z = acc[5]
    prev_n = acc[6:9]
    prev_f = acc[9]

    # ---- disocclusion + accumulate (common.disocclusion_weight semantics) ----
    rel = jnp.abs(prev_z - (vz + mvz)) / jnp.maximum(jnp.abs(vz), 1e-3)
    ok = (rel < thr).astype(f32) * (jnp.sum(nrm * prev_n, axis=0) > 0.5).astype(f32)
    valid = ok * inscr * conf
    frames = jnp.minimum(prev_f * valid + 1.0, mf_ref[0, 0])
    alpha = 1.0 / frames
    lum = _lum(ilff)
    hit = valid > 0.0
    acc_il = jnp.where(hit[None],
                       prev_il * (1.0 - alpha)[None] + ilff * alpha[None], ilff)
    m1 = jnp.where(hit, prev_m1 * (1.0 - alpha) + lum * alpha, lum)
    m2 = jnp.where(hit, prev_m2 * (1.0 - alpha) + lum * lum * alpha, lum * lum)

    # ---- variance (temporal + 3x3 spatial fallback for short histories) ----
    var_t = jnp.maximum(m2 - m1 * m1, 0.0)
    lacc = _lum(acc_il)                       # (ext, wp)
    s1 = jnp.zeros((band, wp), f32)
    s2 = jnp.zeros((band, wp), f32)
    for dyt in (-1, 0, 1):
        rows = lacc[1 + dyt:1 + dyt + band]
        for dxt in (-1, 0, 1):
            tap = pltpu.roll(rows, (-dxt) % wp, 1) if dxt else rows
            s1 = s1 + tap
            s2 = s2 + tap * tap
    mu = s1 / 9.0
    var_s = jnp.maximum(s2 / 9.0 - mu * mu, 0.0)

    ctr = slice(1, 1 + band)
    var_tc = var_t[ctr]
    var = jnp.where(frames[ctr] < 4.0, jnp.maximum(var_s, var_tc), var_tc)

    out_ref[0:3] = acc_il[:, ctr, :]
    out_ref[3] = m1[ctr]
    out_ref[4] = m2[ctr]
    out_ref[5] = frames[ctr]
    out_ref[6] = var


def taccum_variance_pallas(hist, illum, view_z, normal, mv, s, conf_plane,
                           interpret: bool = False):
    """Fused taccum for one RELAX signal; REQUIRES max|clamped disp| < _D - 1
    (callers guard; see taccum_fused_auto). Returns
    (acc_illum, acc_moments, frames, variance)."""
    h, w = view_z.shape
    f32 = illum.dtype
    hist_packed = jnp.concatenate(
        [hist.illum, hist.moments, hist.view_z[..., None], hist.normal,
         hist.frames[..., None]], axis=-1)                       # (H, W, 10)
    cur = jnp.concatenate(
        [illum, view_z[..., None], normal, mv, conf_plane[..., None]],
        axis=-1)                                                 # (H, W, 11)

    wp = -(-(_XOFF + w + _XOFF) // 128) * 128
    band = min(_BAND, max(8, (h // 8) * 8))
    # VMEM: 2 scratches + the rolled gather window + out double-buffer
    budget = 64 << 20
    while band > 8 and (
        (21 * (band + 2 * _HH) + 10 * (band + 8) + 7 * band * 2 + 30 * band)
        * wp * 4
    ) > budget:
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
            _taccum_kernel, band=band, h=h, w=w, wp=wp,
            thr=float(s.disocclusion_threshold),
            anti_ff=bool(s.enable_anti_firefly),
        ),
        grid=(hp // band,),
        # max_frames rides as an SMEM scalar: Settings.max_accumulated_frame_num
        # is a TRACED per-frame value (adaptive accumulation) — baking it in
        # with float() raised ConcretizationTypeError on every TPU RELAX
        # monolithic frame
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((7, band, wp), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((7, hp, wp), f32),
        scratch_shapes=[
            pltpu.VMEM((10, band + 2 * _HH, wp), f32),
            pltpu.VMEM((11, band + 2 * _HH, wp), f32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(planar(hist_packed), planar(cur),
      jnp.asarray(s.max_accumulated_frames, f32).reshape(1, 1))

    out = out[:, :h, _XOFF:_XOFF + w]
    return (jnp.moveaxis(out[0:3], 0, -1),
            jnp.moveaxis(out[3:5], 0, -1),
            out[5], out[6])


def _reference_impl(hi, hm, hz, hn, hf, illum, view_z, normal, mv, conf, s,
                    robust_gather: bool = True):
    """XLA reference of the fused block. robust_gather=True (the VJP path)
    forces the plain tap-form gather so the whole function is differentiable;
    False (the fast-motion fallback branch) keeps the tiered Pallas gather of
    the pre-fusion production path (ops/reproject.py)."""
    from nrdsample_tpu.denoise import common, relax
    from nrdsample_tpu.mathlib import filtering

    il = common.anti_firefly(illum) if s.enable_anti_firefly else illum
    hist = relax.RelaxHistory(illum=hi, moments=hm, view_z=hz, normal=hn,
                              frames=hf)
    pre = None
    if robust_gather:
        plane, pos = relax.taccum_requests(hist, mv[..., :2])
        pre = filtering.sample_bilinear(plane, pos)
    acc, m, fr, _ = relax.temporal_accumulate(
        hist, il, view_z, normal, mv, s, confidence=conf, pre=pre)
    var = relax.estimate_variance(acc, m, fr)
    return acc, m, fr, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _fused_diff(hi, hm, hz, hn, hf, illum, view_z, normal, mv, conf, s):
    """Pallas forward, XLA-reference backward (pallas_call has no transpose;
    same pattern as atrous_pallas._iteration_diff)."""
    from nrdsample_tpu.denoise import relax

    hist = relax.RelaxHistory(illum=hi, moments=hm, view_z=hz, normal=hn,
                              frames=hf)
    return taccum_variance_pallas(hist, illum, view_z, normal, mv, s, conf)


def _fused_fwd(hi, hm, hz, hn, hf, illum, view_z, normal, mv, conf, s):
    out = _fused_diff(hi, hm, hz, hn, hf, illum, view_z, normal, mv, conf, s)
    return out, (hi, hm, hz, hn, hf, illum, view_z, normal, mv, conf)


def _fused_bwd(s, res, ct):
    _, vjp = jax.vjp(lambda *a: _reference_impl(*a, s), *res)
    return vjp(ct)


_fused_diff.defvjp(_fused_fwd, _fused_bwd)


def taccum_fused_auto(hist, illum, view_z, normal, mv, s, reset=False,
                      confidence=None):
    """Dispatcher: the fused kernel when every displacement is inside the
    stencil bound (runtime lax.cond — typical frames), the XLA reference
    otherwise. Returns (acc_illum, acc_moments, frames, variance)."""
    h, w = view_z.shape
    conf = (jnp.ones((h, w), view_z.dtype) if confidence is None
            else confidence)
    conf = conf * jnp.where(reset, 0.0, 1.0)
    args = (hist.illum, hist.moments, hist.view_z, hist.normal, hist.frames,
            illum, view_z, normal, mv, conf)
    from nrdsample_tpu.ops.traversal import _tpu_platform

    if not _tpu_platform():
        return _reference_impl(*args, s)
    mx = jnp.max(jnp.abs(mv[..., :2]))
    # fallback uses robust_gather=True: the tiered Pallas gather
    # (reproject_bounded) has no autodiff rule, and lax.cond transposes BOTH
    # branches — robust taps keep jax.grad through denoise() working on TPU
    # even for fast-motion frames (ADVICE r4 #1; slightly slower there)
    return jax.lax.cond(
        mx < (_D - 1.0),
        lambda: _fused_diff(*args, s),
        lambda: _reference_impl(*args, s, robust_gather=True),
    )
