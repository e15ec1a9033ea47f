"""Pallas bounded-displacement bilinear reprojection — the denoisers' history
gather without the XLA gather emitter.

Why: temporal accumulation samples the packed history at cur + mv. XLA:TPU's
robust gather emitter costs ~15 ns per gathered ROW regardless of width — the
RELAX taccum's 4 taps at 512² measured 15.2 ms, dominating the whole denoise
stack; the fast block emitter is unusable in rich programs (the r2 device-
global latch, pipeline/frame.py make_staged_frame docstring).

Design: motion vectors are small in practice, so the gather becomes a
tent-weighted STENCIL: bilinear(img, p) = Σ_o tent(disp - o) · img[p + o]
over integer offsets |o| <= D. Mosaic only allows unaligned slicing on the
SUBLANE axis, so the 2-D stencil splits exactly into
  V_ox[y, x] = Σ_oy tent(dy[y, x+ox] - oy) · img[y+oy, x+ox]   (Pallas: 17
      vertical passes over a VMEM row band, sublane slices only, sharing one
      DMA; dy pre-shifted per ox so each V column carries the weight of the
      output pixel that will consume it)
  out[y, x]  = Σ_ox tent(dx[y, x] - ox) · V_ox[y, x+ox]        (XLA: 2D+1
      static shifted-fma, fusable elementwise)
which equals 4-tap clamp-to-edge bilinear exactly for |disp| < D (edge-
replicated padding == index clamping). Callers guard with a runtime lax.cond
on max|mv| and fall back to the XLA tap form for fast motion (and on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_DISP = 8      # static displacement bound (pixels) of the stencil path
_BAND = 32        # output rows per grid step (out block 17*C*band*W must fit VMEM)


def _vertical_kernel(img_hbm, dys_ref, out_ref, scratch, sem,
                     *, d: int, band: int, w: int, c: int):
    """One row band: DMA rows [i*band, i*band + band + 2d) of every channel
    plane, then 2d+1 vertical tent passes (one per future x-offset), each
    weighted by its pre-x-shifted dy field."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(i * band, band + 2 * d), :], scratch, sem
    )
    dma.start()
    dma.wait()

    n_off = 2 * d + 1
    for k in range(n_off):
        dy = dys_ref[k]                       # (band, w)
        acc = jnp.zeros((c, band, w), out_ref.dtype)
        for oy in range(-d, d + 1):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy - oy))[None, :, :]
            rows = scratch[:, d + oy:d + oy + band, :w]   # sublane slice: OK
            acc = acc + rows * wy
        out_ref[k] = acc


def _shift_x(a, ox: int):
    """Clamped-edge x-shift of [..., W]: out[..., x] = a[..., x + ox]."""
    if ox == 0:
        return a
    w = a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 1) + [(max(-ox, 0), max(ox, 0))]
    padded = jnp.pad(a, pad, mode="edge")
    x0 = max(ox, 0)
    return jax.lax.slice_in_dim(padded, x0, x0 + w, axis=a.ndim - 1)


def reproject_bounded(img: jnp.ndarray, pos: jnp.ndarray,
                      d: int = MAX_DISP, interpret: bool = False):
    """Bilinear-sample img (H, W, C) at pos (H, W, 2) [(x, y) pixel units],
    assuming |pos - pixel_center| < d. Exactly matches
    filtering.sample_bilinear (clamp-to-edge) under that bound."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    from nrdsample_tpu.denoise import common

    # clamp the sample position into the image: identical to the tap form's
    # index clipping (weights of clipped duplicate texels telescope), and it
    # keeps every nonzero-weight column in range so the split-pass column
    # clamp never engages
    pos = jnp.stack(
        [jnp.clip(pos[..., 0], 0.5, w - 0.5),
         jnp.clip(pos[..., 1], 0.5, h - 0.5)], axis=-1
    )
    disp = pos - common.pixel_positions(h, w)
    dx = disp[..., 0]
    dy = disp[..., 1]

    assert (2 * d) % 8 == 0, "DMA row extent (band + 2d) must be 8-aligned"
    band = min(_BAND, h)
    # the double-buffered output window ((2d+1) passes x C channels x band x W)
    # plus the input scratch must fit VMEM: at 1440p/10ch/d=8 a 32-row band is
    # 111 MB -> OOM; shrink in 8-row steps (8 is the sublane tile)
    w128 = -(-w // 128) * 128
    budget = 56 << 20
    while band > 8 and (
        (2 * d + 1) * c * band * w * 4 * 2 + c * (band + 2 * d) * w128 * 4
    ) > budget:
        band -= 8
    pad_h = (-h) % band
    if pad_h:
        img = jnp.pad(img, ((0, pad_h), (0, 0), (0, 0)), mode="edge")
        dx = jnp.pad(dx, ((0, pad_h), (0, 0)))
        dy = jnp.pad(dy, ((0, pad_h), (0, 0)))
    hp = h + pad_h
    # channel-planar + y edge pad (replicated edge == index clamping); the
    # lane (x) extent of the DMA'd region must be a 128 multiple
    planar = jnp.moveaxis(img, -1, 0)                       # (C, Hp, W)
    w_pad = -(-w // 128) * 128
    padded = jnp.pad(planar, ((0, 0), (d, d), (0, w_pad - w)), mode="edge")

    n_off = 2 * d + 1
    # dy pre-shifted per x-offset: V_ox's column x' is consumed by output
    # pixel x'-ox in the epilogue's +ox shift, so it carries dy[y, x'-ox]
    dys = jnp.stack([_shift_x(dy, -ox) for ox in range(-d, d + 1)], axis=0)

    grid = hp // band
    v = pl.pallas_call(
        functools.partial(_vertical_kernel, d=d, band=band, w=w, c=c),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # padded planes (HBM)
            pl.BlockSpec((n_off, band, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_off, c, band, w), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_off, c, hp, w), img.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, band + 2 * d, w_pad), img.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(padded, dys)

    # horizontal pass (XLA): out = Σ_ox tent(dx - ox) · shift_x(V_ox, ox)
    out = jnp.zeros((c, hp, w), img.dtype)
    for k, ox in enumerate(range(-d, d + 1)):
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx - ox))[None, :, :]
        out = out + _shift_x(v[k], ox) * wx
    out = jnp.moveaxis(out, 0, -1)[:h]
    return out[..., 0] if squeeze else out


def sample_bicubic_auto(img: jnp.ndarray, pos: jnp.ndarray,
                        sharpness: float = 0.66):
    """5-tap no-corners bicubic over the bounded-displacement stencil.

    The tier decision runs ONCE on the base displacement (tap offsets are
    within ±2.5 px of it), then all five taps share the chosen kernel size —
    vs. calling sample_bilinear_auto per tap, which would trace 15 stencil
    kernels. Falls back to the robust tap form off-TPU or for fast motion."""
    from nrdsample_tpu.mathlib import filtering
    from nrdsample_tpu.ops.traversal import _tpu_platform

    if not _tpu_platform():
        return filtering.sample_bicubic_no_corners(img, pos, sharpness)

    from nrdsample_tpu.denoise import common

    h, w = img.shape[0], img.shape[1]
    disp = pos - common.pixel_positions(h, w)
    mx = jnp.max(jnp.abs(disp)) + 2.5  # bicubic support margin

    def tiered(d):
        return lambda: filtering.sample_bicubic_no_corners(
            img, pos, sharpness,
            bilinear_fn=lambda im, p: reproject_bounded(im, p, d),
        )

    return jax.lax.cond(
        mx < 7.0,
        tiered(8),
        lambda: jax.lax.cond(
            mx < 15.0,
            tiered(16),
            lambda: filtering.sample_bicubic_no_corners(img, pos, sharpness),
        ),
    )


def sample_bilinear_auto(img: jnp.ndarray, pos: jnp.ndarray,
                         d: int = MAX_DISP):
    """Reprojection dispatcher: the Pallas stencil when every displacement is
    within the static bound (runtime lax.cond — typical frames), the robust
    XLA tap form otherwise; always the tap form off-TPU."""
    from nrdsample_tpu.mathlib import filtering
    from nrdsample_tpu.ops.traversal import _tpu_platform

    if not _tpu_platform():
        return filtering.sample_bilinear(img, pos)
    if pos.ndim > 3:
        # batched tap requests (leading tap axis, e.g. SIGMA's 8 poisson blur
        # taps): displacements are blur-radius scale, far beyond the stencil
        # bound — use the robust tap form outright (avoids tracing 8 unused
        # stencil kernels under the cond)
        return filtering.sample_bilinear(img, pos)

    from nrdsample_tpu.denoise import common

    h, w = img.shape[0], img.shape[1]
    disp = pos - common.pixel_positions(h, w)
    mx = jnp.max(jnp.abs(disp))
    # tiered static bounds: near-static frames (TAA-jitter scale motion, the
    # common case) take the 2*4+1=9-pass stencil; moderate motion the
    # 2*8+1=17-pass one; blur-scale displacement (SIGMA penumbra taps) the
    # 33-pass d=16 one; faster motion falls back to the robust taps.
    # d must keep the DMA row extent (band + 2d) 8-aligned (Mosaic sublane
    # tiling), so the small tier is 4, not 2
    small, big = 4, 16
    return jax.lax.cond(
        mx < (small - 1),
        lambda: reproject_bounded(img, pos, small),
        lambda: jax.lax.cond(
            mx < (d - 1),
            lambda: reproject_bounded(img, pos, d),
            lambda: jax.lax.cond(
                mx < (big - 1),
                lambda: reproject_bounded(img, pos, big),
                lambda: filtering.sample_bilinear(img, pos),
            ),
        ),
    )
