"""Image filtering helpers: bilinear/bicubic resampling over explicit arrays.

ml.hlsli ``Filtering::GetBilinearFilter`` + Shared.hlsli BicubicFilterNoCorners
(349-387) equivalents. Images are [H, W, C]; sample positions are in pixel units
(continuous, (0.5, 0.5) = center of texel (0,0)).
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Clamped integer gather: img [H, W, C], ix/iy [...] -> [..., C]."""
    h, w = img.shape[0], img.shape[1]
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    return img[iy, ix]


def sample_bilinear(img: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample; pos [..., 2] = (x, y) in pixel units."""
    p = pos - 0.5
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0
    x0, y0 = i0[..., 0], i0[..., 1]
    fx, fy = f[..., 0:1], f[..., 1:2]
    c00 = _gather2d(img, x0, y0)
    c10 = _gather2d(img, x0 + 1, y0)
    c01 = _gather2d(img, x0, y0 + 1)
    c11 = _gather2d(img, x0 + 1, y0 + 1)
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def sample_bicubic_no_corners(img: jnp.ndarray, pos: jnp.ndarray, sharpness: float = 0.66) -> jnp.ndarray:
    """5-tap bicubic (corners dropped) — BicubicFilterNoCorners (Shared.hlsli:349-387).

    Used for TAA history resampling (Taa.cs.hlsl:122-123) with
    TAA_HISTORY_SHARPNESS.
    """
    center = jnp.floor(pos - 0.5) + 0.5
    f = jnp.clip(pos - center, 0.0, 1.0)
    f2 = f * f
    f3 = f * f2
    s = sharpness
    w0 = -s * f3 + 2.0 * s * f2 - s * f
    w1 = (2.0 - s) * f3 - (3.0 - s) * f2 + 1.0
    w2 = -(2.0 - s) * f3 + (3.0 - 2.0 * s) * f2 + s * f
    w3 = s * f3 - s * f2
    wl2 = w1 + w2
    tc2 = center + w2 / jnp.maximum(wl2, 1e-15)
    tc0 = center - 1.0
    tc3 = center + 2.0

    def tap(px, py):
        return sample_bilinear(img, jnp.stack([px, py], axis=-1))

    w = wl2[..., 0] * w0[..., 1]
    color = tap(tc2[..., 0], tc0[..., 1]) * w[..., None]
    total = w
    w = w0[..., 0] * wl2[..., 1]
    color += tap(tc0[..., 0], tc2[..., 1]) * w[..., None]
    total += w
    w = wl2[..., 0] * wl2[..., 1]
    color += tap(tc2[..., 0], tc2[..., 1]) * w[..., None]
    total += w
    w = w3[..., 0] * wl2[..., 1]
    color += tap(tc3[..., 0], tc2[..., 1]) * w[..., None]
    total += w
    w = wl2[..., 0] * w3[..., 1]
    color += tap(tc2[..., 0], tc3[..., 1]) * w[..., None]
    total += w
    return color / jnp.maximum(total, 1e-15)[..., None]


def catmull_rom_weights(f: jnp.ndarray):
    """Catmull-Rom weights for 1-D fraction f: returns (w-1, w0, w1, w2)."""
    f2 = f * f
    f3 = f2 * f
    return (
        -0.5 * f3 + f2 - 0.5 * f,
        1.5 * f3 - 2.5 * f2 + 1.0,
        -1.5 * f3 + 2.0 * f2 + 0.5 * f,
        0.5 * f3 - 0.5 * f2,
    )
