"""Checkerboard (RESOLUTION_HALF) reconstruction.

Reference: in RESOLUTION_HALF tracing mode each pixel traces only ONE lobe,
diffuse/specular interleaved in a checkerboard (Shared.hlsli:62-65;
checkerboard-aware WriteResult TraceOpaque.cs.hlsl:482-519), and NRD's
front-end reconstructs the missing half from horizontal neighbors before
temporal accumulation (the `checkerboardMode` settings the sample passes at
NRDSample.cpp:543-585).

Here: the traced lobe images have zeros at the other lobe's pixels; fill them
with the average of the horizontal neighbors (both of which carry the signal,
since the checkerboard alternates per column) — matching NRD's bilinear
checkerboard resolve. Hit distances get the same treatment.
"""

from __future__ import annotations

import jax.numpy as jnp


def checkerboard_mask(h: int, w: int, frame):
    """(H, W) bool: True where the DIFFUSE lobe was traced this frame.
    MUST match the tracer's selector (rng.checkerboard: (px^py^frame)&1)."""
    from nrdsample_tpu.mathlib import rng

    y = jnp.arange(h, dtype=jnp.int32)[:, None]
    x = jnp.arange(w, dtype=jnp.int32)[None, :]
    return rng.checkerboard(x, y, frame).astype(bool)


def resolve(img: jnp.ndarray, traced: jnp.ndarray) -> jnp.ndarray:
    """Fill untraced pixels from horizontal neighbors.

    img: (H, W[, C]) with valid data where `traced` (H, W) is True.
    Neighbors at x-1/x+1 are always traced (checkerboard), edge-clamped.
    """
    left = jnp.roll(img, 1, axis=1)
    right = jnp.roll(img, -1, axis=1)
    # edge clamp: first/last column's out-of-screen neighbor mirrors the other
    left = left.at[:, 0].set(right[:, 0])
    right = right.at[:, -1].set(left[:, -1])
    fill = 0.5 * (left + right)
    m = traced
    while m.ndim < img.ndim:
        m = m[..., None]
    return jnp.where(m, img, fill)


def hitdist_reconstruct_3x3(hitdist: jnp.ndarray) -> jnp.ndarray:
    """AREA_3X3 hit-distance reconstruction (the hitDistanceReconstructionMode
    NRD-Sample enables whenever tracingMode == RESOLUTION_FULL_PROBABILISTIC,
    NRDSample.cpp:548/:569): probabilistic lobe selection leaves the unsampled
    lobe's hit distance at 0, which would poison REBLUR's hitT-driven blur
    radius and virtual-motion reprojection; fill zeros with the average of the
    valid 3x3 neighbors (zeros stay zero only if the whole neighborhood is
    empty).

    hitdist: (H, W) with 0 marking "not sampled this frame".
    """
    from nrdsample_tpu.denoise import common

    valid = (hitdist > 0.0).astype(hitdist.dtype)
    num = jnp.zeros_like(hitdist)
    den = jnp.zeros_like(hitdist)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            num = num + common.shifted(hitdist, dy, dx)
            den = den + common.shifted(valid, dy, dx)
    fill = num / jnp.maximum(den, 1.0)
    return jnp.where(hitdist > 0.0, hitdist, fill)
