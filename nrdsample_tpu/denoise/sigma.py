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
    # 14 (not 16): keeps every Poisson tap inside the d=16 Pallas
    # bounded-displacement stencil tier (ops/reproject.py) — the robust XLA
    # gather emitter cost 584 ms for this pass at 1080p
    max_radius_px: float = 14.0
    phi_depth: float = 1.0
    disocclusion_threshold: float = 0.02


_POISSON_8 = [
    (-0.843, 0.155), (0.333, -0.855), (0.871, 0.440), (-0.298, 0.900),
    (-0.315, -0.450), (0.519, 0.037), (-0.799, -0.534), (0.061, 0.455),
]


def _blur_positions(shadow_hit_dist, view_z, tan_sun_angular_radius,
                    unproject: float, frame_idx, s: SigmaSettings):
    """(8, H, W, 2) Poisson tap positions at the per-pixel penumbra radius."""
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

    pos0 = common.pixel_positions(h, w)
    a = jnp.asarray(frame_idx, jnp.float32) * 2.39996
    ca, sa = jnp.cos(a), jnp.sin(a)
    taps = []
    for tx, ty in _POISSON_8:
        ox = (tx * ca - ty * sa) * radius
        oy = (tx * sa + ty * ca) * radius
        taps.append(pos0 + jnp.stack([ox, oy], axis=-1))
    return jnp.stack(taps, axis=0)


def requests(hist: SigmaHistory, shadow, shadow_hit_dist, view_z, mv,
             tan_sun_angular_radius, unproject: float, frame_idx,
             s: SigmaSettings = SigmaSettings()):
    """Gather-pass plan: 'taps' = [shadow, view_z] at 8 Poisson positions
    (penumbra blur); 'temporal' = [hist.shadow, hist.frames] at cur + mv."""
    h, w = view_z.shape
    taps_pos = _blur_positions(
        shadow_hit_dist, view_z, tan_sun_angular_radius, unproject, frame_idx, s
    )
    taps_plane = jnp.stack([shadow, view_z], axis=-1)
    t_pos = common.pixel_positions(h, w) + mv[..., :2]
    t_plane = jnp.stack([hist.shadow, hist.frames], axis=-1)
    return {"taps": (taps_plane, taps_pos), "temporal": (t_plane, t_pos)}


def denoise(hist: SigmaHistory, shadow, shadow_hit_dist, view_z, mv,
            tan_sun_angular_radius, unproject: float, frame_idx,
            s: SigmaSettings = SigmaSettings(), reset=False, pre=None):
    """shadow: (H, W) visibility; shadow_hit_dist: (H, W) occluder distance
    (0 where unshadowed). Returns (denoised shadow, new history).

    pre: optional pre-gathered {'taps': (8,H,W,2), 'temporal': (H,W,2)} from
    the staged gather pass; when None the gathers run in-program."""
    h, w = view_z.shape
    if pre is None:
        from nrdsample_tpu.ops.traversal import _tpu_platform

        reqs = requests(hist, shadow, shadow_hit_dist, view_z, mv,
                        tan_sun_angular_radius, unproject, frame_idx, s)
        if _tpu_platform():
            # Pallas stencil taps: every Poisson position is within
            # max_radius_px < 15 of its pixel, so the d=16 bounded stencil
            # covers it statically (no robust-gather fallback needed)
            from nrdsample_tpu.ops import reproject as repr_mod

            taps_plane, taps_pos = reqs["taps"]
            taps = jnp.stack([
                repr_mod.reproject_bounded(taps_plane, taps_pos[i], 16)
                for i in range(taps_pos.shape[0])
            ], axis=0)
            t_plane, t_pos = reqs["temporal"]
            pre = {"taps": taps,
                   "temporal": repr_mod.sample_bilinear_auto(t_plane, t_pos)}
        else:
            from nrdsample_tpu.denoise import gatherpass

            pre = gatherpass.execute_inline(
                reqs,
                {"taps": gatherpass.BILINEAR, "temporal": gatherpass.BILINEAR},
            )

    # spatial blur with depth edge stopping
    acc = shadow
    acc_w = jnp.ones_like(shadow)
    for i in range(len(_POISSON_8)):
        s_n = pre["taps"][i, ..., 0]
        z_n = pre["taps"][i, ..., 1]
        wz = jnp.exp(
            -jnp.abs(z_n - view_z) / (s.phi_depth * jnp.maximum(jnp.abs(view_z), 1e-3))
        )
        acc = acc + s_n * wz
        acc_w = acc_w + wz
    blurred = acc / acc_w

    # temporal accumulation (short)
    mv_xy = mv[..., :2]
    prev, prev_frames = pre["temporal"][..., 0], pre["temporal"][..., 1]
    valid = common.in_screen(mv_xy, h, w).astype(view_z.dtype)
    valid = jnp.where(reset, 0.0, valid)
    frames = jnp.minimum(prev_frames * valid + 1.0, s.max_accumulated_frames)
    alpha = 1.0 / frames
    out = prev * (1 - alpha) + blurred * alpha
    out = jnp.where(valid > 0, out, blurred)
    out = jnp.clip(out, 0.0, 1.0)

    return out, SigmaHistory(shadow=out, frames=frames)
