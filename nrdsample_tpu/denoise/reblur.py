"""REBLUR — recurrent-blur diffuse/specular denoiser.

Reference: NRD's REBLUR (external submodule; defaults exercised at
NRDSample.cpp:563-585, front-end packing TraceOpaque.cs.hlsl:730-759, hit-dist
normalization via gHitDistSettings). Reimplemented from the published
"ReBLUR: A Hierarchical Recurrent Denoiser" algorithm outline (Ray Tracing
Gems II ch. 49) — behaviorally validated (SURVEY.md §7.3.3):

  1. temporal accumulation with disocclusion-aware accumulation speed,
  2. hit-distance-driven adaptive-radius poisson-disk blur (radius shrinks with
     accumulated frames and with normalized hit distance; specular radius also
     shrinks with roughness via the "spec magic curve"),
  3. temporal stabilization: history clamped to the spatial neighborhood
     mean ± sigma (anti-lag).

Data-dependent tap positions use bilinear gathers — still dense VPU work.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from nrdsample_tpu.denoise import common
from nrdsample_tpu.mathlib import filtering


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ReblurHistory:
    illum: jnp.ndarray        # (H, W, 3)
    fast_illum: jnp.ndarray   # (H, W, 3) short-history (fast) channel
    hitdist: jnp.ndarray      # (H, W)
    view_z: jnp.ndarray       # (H, W)
    normal: jnp.ndarray       # (H, W, 3)
    frames: jnp.ndarray       # (H, W)

    @staticmethod
    def create(h: int, w: int, dtype=jnp.float32) -> "ReblurHistory":
        z = jnp.zeros((h, w, 3), dtype)
        return ReblurHistory(
            illum=z, fast_illum=z, hitdist=jnp.zeros((h, w), dtype),
            view_z=jnp.full((h, w), 1e5, dtype),
            normal=jnp.zeros((h, w, 3), dtype),
            frames=jnp.zeros((h, w), dtype),
        )


@dataclasses.dataclass(frozen=True)
class ReblurSettings:
    """Mirrors the exercised subset of nrd::ReblurSettings
    (GetDefaultReblurSettings, NRDSample.cpp:563-585)."""

    max_accumulated_frames: int = 30
    max_fast_accumulated_frames: int = 6
    blur_radius_px: float = 15.0
    min_blur_radius_px: float = 1.0
    disocclusion_threshold: float = 0.02
    anti_lag_sigma: float = 2.0
    enable_anti_firefly: bool = True
    phi_normal: float = 64.0
    phi_depth: float = 1.0
    # NRD historyFixFrameNum: pixels with fewer accumulated frames than this
    # (fresh disocclusions) get their signal reconstructed spatially
    history_fix_frame_num: float = 3.0
    history_fix_stride: int = 2


_POISSON_8 = [  # unit-disk poisson taps (8), classic REBLUR-style set
    (-0.843, 0.155), (0.333, -0.855), (0.871, 0.440), (-0.298, 0.900),
    (-0.315, -0.450), (0.519, 0.037), (-0.799, -0.534), (0.061, 0.455),
]


def spec_magic_curve(roughness):
    """GetSpecMagicCurve (Shared.hlsli:305-311)."""
    from nrdsample_tpu.mathlib import geometry as geo

    f = 1.0 - jnp.exp2(-200.0 * roughness * roughness)
    return f * geo.pow01(roughness, 0.5)


def specular_dominant_factor(roughness):
    """Fraction of the specular lobe that behaves like a mirror reflection
    (ImportanceSampling::GetSpecularDominantFactor shape): 1 at r=0, -> 0 as
    r -> 1. Drives how far the virtual image sits behind the reflector."""
    r = jnp.clip(roughness, 0.0, 1.0)
    return (1.0 - r) * (jnp.sqrt(1.0 - r) + r)


def specular_virtual_mv(cam, x, view_dir, spec_hitdist, roughness, mv,
                        width: int, height: int, miss=None):
    """Virtual-motion reprojection for the specular channel (the REBLUR
    virtual-history idea, GetDefaultReblurSettings NRDSample.cpp:563-585):
    a reflection does not move with the reflector surface — it moves with the
    VIRTUAL image at X + V * hitT * D behind the surface. Reprojecting the
    specular history at the virtual point keeps mirror reflections sharp under
    camera motion instead of smearing them with the surface motion vector.

    x: (H, W, 3) primary hit position; view_dir: (H, W, 3) unit eye->surface;
    mv: (H, W, 3) surface 2.5D motion. Returns (H, W, 3) motion for the
    specular history lookup (xy blended toward virtual, z kept surface-based
    for the disocclusion test).
    """
    from nrdsample_tpu.scene import camera as cam_mod

    amount = specular_dominant_factor(roughness)
    xv = x + view_dir * (spec_hitdist * amount)[..., None]
    # Xv lies on the primary ray, so its current projection IS this pixel;
    # only the previous-frame projection differs from the surface one.
    uv_cur = cam_mod.world_to_uv(cam, x, prev=False)
    uv_prev = cam_mod.world_to_uv(cam, xv, prev=True)
    wh = jnp.array([width, height], jnp.float32)
    mv_virt_xy = (uv_prev - uv_cur) * wh
    mv_xy = mv[..., :2] + (mv_virt_xy - mv[..., :2]) * amount[..., None]
    if miss is not None:
        mv_xy = jnp.where(miss[..., None], mv[..., :2], mv_xy)
    return jnp.concatenate([mv_xy, mv[..., 2:3]], axis=-1)


def _rot2(frame):
    a = jnp.asarray(frame, jnp.float32) * 2.39996  # golden-angle per frame
    return jnp.cos(a), jnp.sin(a)


def blur_requests(acc, hitdist, view_z, normal, roughness, frames, frame_idx,
                  s: ReblurSettings, is_spec: bool, unproject: float):
    """Gather plan for the adaptive Poisson-disk blur: per-pixel radius from
    convergence + world-space hit distance (+ spec magic curve), 8 golden-angle
    rotated taps. Returns (plane (H, W, 8) = [illum3, hitdist, view_z,
    normal3], pos (8, H, W, 2)) — ONE packed gather instead of four.

    Tap positions depend on the ACCUMULATED state, so in the staged frame this
    is a second plan/gather round after temporal accumulation."""
    h, w = view_z.shape
    # normalized convergence in [0,1]
    conv = frames / s.max_accumulated_frames
    radius = s.blur_radius_px * (1.0 - 0.9 * conv)
    # scale by hit distance (short hitT -> contact -> small radius); normalize
    # by pixel size at this depth
    pixel_size = jnp.maximum(jnp.abs(view_z) * unproject, 1e-6)
    hit_factor = jnp.clip(hitdist / (pixel_size * 30.0), 0.05, 1.0)
    radius = radius * hit_factor
    if is_spec:
        radius = radius * jnp.clip(spec_magic_curve(roughness), 0.05, 1.0)
    radius = jnp.maximum(radius, s.min_blur_radius_px)

    pos0 = common.pixel_positions(h, w)
    ca, sa = _rot2(frame_idx)
    taps = []
    for tx, ty in _POISSON_8:
        ox = (tx * ca - ty * sa) * radius
        oy = (tx * sa + ty * ca) * radius
        taps.append(pos0 + jnp.stack([ox, oy], axis=-1))
    plane = jnp.concatenate(
        [acc, hitdist[..., None], view_z[..., None], normal], axis=-1
    )
    return plane, jnp.stack(taps, axis=0)


def blur_finish(acc, hitdist, view_z, normal, taps, s: ReblurSettings):
    """Depth/normal-bilateral fold of the pre-gathered blur taps.

    taps: (8, H, W, 8) gathered blur_requests plane. Returns (blurred illum,
    blurred hitdist)."""
    acc_o = acc
    acc_hd = hitdist
    acc_w = jnp.ones_like(view_z)
    for i in range(len(_POISSON_8)):
        illum_n = taps[i, ..., 0:3]
        hd_n = taps[i, ..., 3]
        z_n = taps[i, ..., 4]
        n_n = taps[i, ..., 5:8]
        wz = jnp.exp(
            -jnp.abs(z_n - view_z) / (s.phi_depth * jnp.maximum(jnp.abs(view_z), 1e-3))
        )
        wn = jnp.power(jnp.clip(jnp.sum(n_n * normal, axis=-1), 0.0, 1.0), s.phi_normal)
        wgt = wz * wn
        acc_o = acc_o + illum_n * wgt[..., None]
        acc_hd = acc_hd + hd_n * wgt
        acc_w = acc_w + wgt
    inv = 1.0 / acc_w
    return acc_o * inv[..., None], acc_hd * inv


def adaptive_blur(illum, hitdist, view_z, normal, roughness, frames, frame_idx,
                  s: ReblurSettings, is_spec: bool, unproject: float):
    """Poisson-disk blur with per-pixel world-space-informed radius
    (blur_requests + inline gather + blur_finish)."""
    plane, pos = blur_requests(
        illum, hitdist, view_z, normal, roughness, frames, frame_idx, s,
        is_spec, unproject,
    )
    taps = filtering.sample_bilinear(plane, pos)
    return blur_finish(illum, hitdist, view_z, normal, taps, s)


def history_fix(acc, fast, view_z, normal, frames, s: ReblurSettings):
    """NRD REBLUR HistoryFix: right after a disocclusion the accumulated
    signal is 1-2 raw samples — pure noise. Reconstruct it from a WIDE
    (5x5, stride-s) depth/normal-bilateral blur, blending back to the
    accumulated value as the history refills (NRD's mip-chain fix-up,
    approximated with one strided stencil; exercised via the REBLUR row of
    SURVEY.md §2.3, NRDSample.cpp:563-585 defaults).

    Returns (fixed_slow, fixed_fast)."""
    fix_w = jnp.clip(1.0 - frames / s.history_fix_frame_num, 0.0, 1.0)
    st = s.history_fix_stride
    acc_s = jnp.zeros_like(acc)
    acc_f = jnp.zeros_like(fast)
    w_sum = jnp.zeros_like(view_z)
    for dy, dx in common.stencil_taps(2):
        z_n = common.shifted(view_z, dy * st, dx * st)
        n_n = common.shifted(normal, dy * st, dx * st)
        wz = jnp.exp(
            -jnp.abs(z_n - view_z)
            / (s.phi_depth * jnp.maximum(jnp.abs(view_z), 1e-3))
        )
        wn = jnp.power(
            jnp.clip(jnp.sum(n_n * normal, axis=-1), 0.0, 1.0), s.phi_normal
        )
        wgt = wz * wn
        acc_s = acc_s + common.shifted(acc, dy * st, dx * st) * wgt[..., None]
        acc_f = acc_f + common.shifted(fast, dy * st, dx * st) * wgt[..., None]
        w_sum = w_sum + wgt
    inv = 1.0 / jnp.maximum(w_sum, 1e-6)
    blur_s = acc_s * inv[..., None]
    blur_f = acc_f * inv[..., None]
    return (
        acc + (blur_s - acc) * fix_w[..., None],
        fast + (blur_f - fast) * fix_w[..., None],
    )


def taccum_requests(hist: ReblurHistory, mv_xy):
    """Gather-pass plan for temporal accumulation: 'illum' = bicubic history
    color; 'packed' = bilinear [fast(3), hitdist(1), view_z(1), normal(3),
    frames(1)] — both at cur + mv."""
    packed = jnp.concatenate(
        [hist.fast_illum, hist.hitdist[..., None], hist.view_z[..., None],
         hist.normal, hist.frames[..., None]], axis=-1)
    h, w = hist.view_z.shape
    pos = common.pixel_positions(h, w) + mv_xy
    return {"illum": (hist.illum, pos), "packed": (packed, pos)}


def accumulate(hist: ReblurHistory, illum, hitdist, view_z, normal, mv,
               s: ReblurSettings, reset=False, confidence=None, pre=None):
    """Temporal accumulation + history fix-up. Returns (acc, fast, hd, frames).

    pre: optional pre-gathered taccum_requests dict (staged gather pass)."""
    h, w = view_z.shape
    mv_xy = mv[..., :2]

    if pre is None:
        from nrdsample_tpu.denoise import gatherpass

        pre = gatherpass.execute_inline(
            taccum_requests(hist, mv_xy),
            {"illum": gatherpass.BICUBIC, "packed": gatherpass.BILINEAR},
        )
    prev_illum = pre["illum"]
    packed = pre["packed"]
    prev_fast, prev_hd = packed[..., 0:3], packed[..., 3]
    prev_z, prev_n, prev_frames = packed[..., 4], packed[..., 5:8], packed[..., 8]

    valid = common.disocclusion_weight(
        view_z, mv[..., 2], prev_z, normal, prev_n, s.disocclusion_threshold
    )
    valid = valid * common.in_screen(mv_xy, h, w).astype(view_z.dtype)
    valid = jnp.where(reset, 0.0, valid)
    if confidence is not None:
        # gPrevFrameConfidence / ConfidenceBlur output: cut history on change
        valid = valid * confidence

    frames = jnp.minimum(prev_frames * valid + 1.0, s.max_accumulated_frames)
    fast_frames = jnp.minimum(prev_frames * valid + 1.0, s.max_fast_accumulated_frames)
    alpha = 1.0 / frames
    alpha_f = 1.0 / fast_frames

    acc = prev_illum * (1 - alpha[..., None]) + illum * alpha[..., None]
    acc = jnp.where(valid[..., None] > 0, acc, illum)
    fast = prev_fast * (1 - alpha_f[..., None]) + illum * alpha_f[..., None]
    fast = jnp.where(valid[..., None] > 0, fast, illum)
    hd = prev_hd * (1 - alpha) + hitdist * alpha
    hd = jnp.where(valid > 0, hd, hitdist)

    # ---- history fix-up: spatial reconstruction of fresh disocclusions ----
    acc, fast = history_fix(acc, fast, view_z, normal, frames, s)
    return acc, fast, hd, frames


def stabilize(blurred, fast, frames, s: ReblurSettings):
    """Temporal stabilization: clamp the blurred slow signal to the fast
    channel's 3x3 neighborhood mean ± sigma (anti-lag), relaxing as history
    converges."""
    mu = jnp.zeros_like(blurred)
    mu2 = jnp.zeros_like(blurred)
    for dy, dx in common.stencil_taps(1):
        f_n = common.shifted(fast, dy, dx)
        mu = mu + f_n
        mu2 = mu2 + f_n * f_n
    mu /= 9.0
    sigma = jnp.sqrt(jnp.maximum(mu2 / 9.0 - mu * mu, 0.0) + 1e-12)
    clamped = jnp.clip(
        blurred, mu - sigma * s.anti_lag_sigma, mu + sigma * s.anti_lag_sigma
    )
    # blend back toward unclamped as history converges
    return clamped + (blurred - clamped) * jnp.clip(frames / 8.0, 0.0, 1.0)[..., None]


def denoise(hist: ReblurHistory, illum, hitdist, view_z, normal, roughness, mv,
            frame_idx, unproject: float, s: ReblurSettings = ReblurSettings(),
            is_spec: bool = False, reset=False, confidence=None, pre=None,
            pre_taps=None):
    """Full REBLUR pipeline for one signal. Returns (denoised, new_history).
    confidence: optional (H, W) [0,1] history-confidence plane.
    pre: optional pre-gathered taccum_requests dict (staged gather pass).
    pre_taps: optional pre-gathered blur_requests taps (8, H, W, 8) — the
    second gather stage; None = inline robust-tap gather."""
    if s.enable_anti_firefly:
        illum = common.anti_firefly(illum)

    acc, fast, hd, frames = accumulate(
        hist, illum, hitdist, view_z, normal, mv, s, reset, confidence, pre
    )

    # ---- adaptive spatial blur ----
    if pre_taps is None:
        blurred, hd_blur = adaptive_blur(
            acc, hd, view_z, normal, roughness, frames, frame_idx, s, is_spec,
            unproject,
        )
    else:
        blurred, hd_blur = blur_finish(acc, hd, view_z, normal, pre_taps, s)

    out = stabilize(blurred, fast, frames, s)

    new_hist = ReblurHistory(
        illum=out, fast_illum=fast, hitdist=hd_blur, view_z=view_z, normal=normal,
        frames=frames,
    )
    return out, new_hist
