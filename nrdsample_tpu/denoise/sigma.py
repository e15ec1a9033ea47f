"""SIGMA — sun-shadow denoiser (penumbra-aware blur + temporal stabilization).

Reference: NRD's SIGMA (external submodule; sample integration: penumbra pack in
TraceOpaque.cs.hlsl:767-804 where the shadow ray's hit distance encodes penumbra
size, SIGMA_TRANSLUCENCY glass tint, back-end unpack Composition.cs.hlsl:58-64).

Reimplementation: the penumbra half-width at a receiver is
  w ≈ hitT * tanSunAngularRadius / pixelSize(viewZ)
(blocker distance x sun angular size). The denoiser blurs the binary visibility
with a spatial kernel of that radius (depth/normal edge-stopped), then applies a
short temporal accumulation. Output: scalar shadow in [0,1] (+ translucency
channel when glass is involved).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nrdsample_tpu.denoise import common
from nrdsample_tpu.mathlib import filtering


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SigmaHistory:
    shadow: jnp.ndarray   # (H, W)
    frames: jnp.ndarray   # (H, W)

    @staticmethod
    def create(h: int, w: int, dtype=jnp.float32) -> "SigmaHistory":
        return SigmaHistory(
            shadow=jnp.ones((h, w), dtype), frames=jnp.zeros((h, w), dtype)
        )


@dataclasses.dataclass(frozen=True)
class SigmaSettings:
    max_accumulated_frames: int = 5   # SIGMA keeps history short (shadows move)
    max_radius_px: float = 16.0
    phi_depth: float = 1.0
    disocclusion_threshold: float = 0.02


_POISSON_8 = [
    (-0.843, 0.155), (0.333, -0.855), (0.871, 0.440), (-0.298, 0.900),
    (-0.315, -0.450), (0.519, 0.037), (-0.799, -0.534), (0.061, 0.455),
]


def denoise(hist: SigmaHistory, shadow, shadow_hit_dist, view_z, mv,
            tan_sun_angular_radius, unproject: float, frame_idx,
            s: SigmaSettings = SigmaSettings(), reset=False):
    """shadow: (H, W) visibility; shadow_hit_dist: (H, W) occluder distance
    (0 where unshadowed). Returns (denoised shadow, new history)."""
    h, w = view_z.shape

    # penumbra radius in pixels (NRD estimates this from the packed penumbra
    # plane; here directly from occluder distance)
    pixel_size = jnp.maximum(jnp.abs(view_z) * unproject, 1e-6)
    radius = shadow_hit_dist * tan_sun_angular_radius / pixel_size
    # spread the radius estimate: a fully-lit pixel near a shadowed one needs a
    # radius too (max-filter over 3x3, twice)
    for _ in range(2):
        r = radius
        for dy, dx in common.stencil_taps(1):
            r = jnp.maximum(r, common.shifted(radius, dy, dx))
        radius = r
    radius = jnp.clip(radius, 0.0, s.max_radius_px)

    # spatial blur with depth edge stopping
    pos0 = common.pixel_positions(h, w)
    a = jnp.asarray(frame_idx, jnp.float32) * 2.39996
    ca, sa = jnp.cos(a), jnp.sin(a)
    acc = shadow
    acc_w = jnp.ones_like(shadow)
    for tx, ty in _POISSON_8:
        ox = (tx * ca - ty * sa) * radius
        oy = (tx * sa + ty * ca) * radius
        pos = pos0 + jnp.stack([ox, oy], axis=-1)
        s_n = filtering.sample_bilinear(shadow[..., None], pos)[..., 0]
        z_n = filtering.sample_bilinear(view_z[..., None], pos)[..., 0]
        wz = jnp.exp(
            -jnp.abs(z_n - view_z) / (s.phi_depth * jnp.maximum(jnp.abs(view_z), 1e-3))
        )
        acc = acc + s_n * wz
        acc_w = acc_w + wz
    blurred = acc / acc_w

    # temporal accumulation (short)
    mv_xy = mv[..., :2]
    prev, prev_frames = common.reproject_many([hist.shadow, hist.frames], mv_xy)
    valid = common.in_screen(mv_xy, h, w).astype(view_z.dtype)
    valid = jnp.where(reset, 0.0, valid)
    frames = jnp.minimum(prev_frames * valid + 1.0, s.max_accumulated_frames)
    alpha = 1.0 / frames
    out = prev * (1 - alpha) + blurred * alpha
    out = jnp.where(valid > 0, out, blurred)
    out = jnp.clip(out, 0.0, 1.0)

    return out, SigmaHistory(shadow=out, frames=frames)
