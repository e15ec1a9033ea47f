"""History-confidence pipeline: gradient -> à-trous blur -> confidence map.

Reference: Shaders/ConfidenceBlur.cs.hlsl (106 LoC): 5-iteration à-trous
cross-bilateral blur of the lighting-change gradient produced by SharcUpdate's
prev-frame retrace (SharcUpdate.cs.hlsl:222-250: |L_prev_retraced -
L_prev_stored| with z-occlusion rejection), then gradient -> confidence via
inverse tonemap + sRGB + (RELAX squaring) + Bayer dithering (91-103). The
confidence plane feeds the denoisers' history clamp (gPrevFrameConfidence).

The gradient input here is the luminance change of the re-lit low-res probe
field between frames (same signal, cheaper derivation).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nrdsample_tpu.denoise import common
from nrdsample_tpu.mathlib import color, rng


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ConfidenceHistory:
    probe_lum: jnp.ndarray   # (Hs, Ws) last frame's probe luminance
    view_z: jnp.ndarray      # (Hs, Ws) last frame's probe viewZ (z-rejection)

    @staticmethod
    def create(hs: int, ws: int, dtype=jnp.float32) -> "ConfidenceHistory":
        return ConfidenceHistory(probe_lum=jnp.zeros((hs, ws), dtype),
                                 view_z=jnp.full((hs, ws), 1e5, dtype))


def gradient_from_probes(hist: ConfidenceHistory, probes: dict):
    """Lighting-change gradient at probe resolution.

    With probes["prev_retrace_lum"] (the PREV-frame probe paths re-traced
    under current lighting with the prev RNG seed — SharcUpdate.cs.hlsl:
    222-250) the gradient is |L_prev_retraced - L_prev_stored|: the replayed
    path has identical sampling noise, so the diff isolates true lighting
    change. Z-occlusion rejection (:242-246) zeroes the gradient where the
    retraced primary depth no longer matches the stored one (camera motion /
    occlusion, not lighting). Falls back to the re-jittered diff
    |L_now - L_prev| when no retrace is provided.

    probes["grad_lum"], when present, is the gradient luminance INCLUDING the
    dynamic-object indirect-shadow term (SharcUpdate.cs.hlsl:181-193), so
    moving occluders register as lighting change even though their shadows are
    noisy."""
    lum_curr = probes.get("grad_lum")
    if lum_curr is None:
        lum_curr = color.luminance(probes["radiance"])
    if "prev_retrace_lum" in probes:
        grad = jnp.abs(probes["prev_retrace_lum"] - hist.probe_lum)
        rel = jnp.abs(probes["prev_retrace_vz"] - hist.view_z) / jnp.maximum(
            jnp.abs(hist.view_z), 1e-3
        )
        grad = jnp.where(rel < 0.05, grad, 0.0)
    else:
        grad = jnp.abs(lum_curr - hist.probe_lum)
    return grad, ConfidenceHistory(probe_lum=lum_curr, view_z=probes["view_z"])


def atrous_blur(grad: jnp.ndarray, view_z: jnp.ndarray, normal: jnp.ndarray,
                iterations: int = 5):
    """5-iteration cross-bilateral à-trous blur of the gradient
    (ConfidenceBlur.cs.hlsl:33-87): Gaussian x plane-distance x normal² weights."""
    gauss = [0.25, 0.5, 0.25]
    max_step = 1 << (iterations - 1)
    steps = jnp.array([1 << it for it in range(iterations)], jnp.int32)
    geom = jnp.concatenate([view_z[..., None], normal], axis=-1)

    # scan over dilation steps (compile-cost fix — see relax.denoise)
    def body(out, step):
        acc = jnp.zeros_like(out)
        acc_w = jnp.zeros_like(out)
        packed = jnp.concatenate([out[..., None], geom], axis=-1)
        for iy, ky in enumerate(gauss):
            for ix, kx in enumerate(gauss):
                dy, dx = (iy - 1) * step, (ix - 1) * step
                tap = common.shifted_dyn(packed, dy, dx, max_step)
                g_n, z_n, n_n = tap[..., 0], tap[..., 1], tap[..., 2:5]
                wz = jnp.exp(
                    -jnp.abs(z_n - view_z) / jnp.maximum(jnp.abs(view_z) * 0.1, 1e-3)
                )
                wn = jnp.clip(jnp.sum(n_n * normal, axis=-1), 0.0, 1.0) ** 2
                w = ky * kx * wz * wn
                acc = acc + g_n * w
                acc_w = acc_w + w
        return acc / jnp.maximum(acc_w, 1e-9), None

    out, _ = jax.lax.scan(body, grad, steps)
    return out


def gradient_to_confidence(grad: jnp.ndarray, frame, relax_square: bool = False):
    """Map a blurred gradient to [0,1] history confidence
    (ConfidenceBlur.cs.hlsl:91-103): big change -> low confidence."""
    c = 1.0 - jnp.clip(color.inverse_tonemap_lum(jnp.clip(grad, 0.0, 0.99)), 0.0, 1.0)
    c = color.linear_to_srgb(c[..., None])[..., 0]
    if relax_square:
        c = c * c
    h, w = c.shape
    px = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    dither = (rng.bayer4x4(px, py, frame) - 0.5) * (1.0 / 16.0)
    return jnp.clip(c + dither, 0.0, 1.0)
