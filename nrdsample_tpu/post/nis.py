"""NIS slot: contrast-adaptive sharpening (VPU-elementwise, shift-based taps).

Stands in for the NVIDIA Image Scaling sharpen dispatch
(NRDSample.cpp:791-817 creates SDR+HDR NIS instances; 4360-4388 dispatches).
NIS-sharpen is a local-contrast-adaptive unsharp mask; this implements the
same shape: a 5-tap cross Laplacian whose gain is scaled down in
high-contrast neighborhoods to avoid ringing (CAS-style), controlled by a
[0, 1] sharpness setting like the reference's ``m_Settings.sharpness``.
"""

from __future__ import annotations

import jax.numpy as jnp

from nrdsample_tpu.mathlib import color


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped neighbor fetch via pad+slice (no gathers)."""
    h, w = img.shape[:2]
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]


def sharpen(img: jnp.ndarray, sharpness) -> jnp.ndarray:
    """Contrast-adaptive sharpen of an (H, W, 3) [0, inf) color image.

    sharpness in [0, 1]; 0 is identity. Operates on the tonemapped-range input
    the reference feeds NIS (post TAA / DLSS, pre Final).
    """
    n = _shift(img, -1, 0)
    s = _shift(img, 1, 0)
    w_ = _shift(img, 0, -1)
    e = _shift(img, 0, 1)

    lum = color.luminance(img)
    lmin = jnp.minimum(
        jnp.minimum(color.luminance(n), color.luminance(s)),
        jnp.minimum(jnp.minimum(color.luminance(w_), color.luminance(e)), lum),
    )
    lmax = jnp.maximum(
        jnp.maximum(color.luminance(n), color.luminance(s)),
        jnp.maximum(jnp.maximum(color.luminance(w_), color.luminance(e)), lum),
    )
    # CAS-style adaptive gain: full strength in flat regions, rolls off where
    # the local dynamic range is already large
    eps = 1e-4
    contrast = (lmax - lmin) / (lmax + eps)
    gain = jnp.sqrt(jnp.clip(1.0 - contrast, 0.0, 1.0))
    amount = (sharpness * 0.4 * gain)[..., None]

    laplacian = 4.0 * img - n - s - w_ - e
    return jnp.maximum(img + amount * laplacian, 0.0)
