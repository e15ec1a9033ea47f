"""Learned denoiser for the DLSS-RR slot.

The reference dispatches DLSS-RR in place of the NRD denoisers, feeding noisy
composed radiance plus the guide buffers of DlssBefore.cs.hlsl:36-62
(NRDSample.cpp:853-867, 4284-4317). This module fills that slot with a small
recurrent residual CNN: inputs are the noisy composed color, the RR guide set
(post/guides.py: diff/spec albedo, normal+roughness, hw depth), and the
PREVIOUS denoised output reprojected by the motion vectors; output is the
denoised radiance. Weights ship with the repo (tools/train_neural_rr.py
trains them on repo-rendered noisy/converged pairs; tests/test_neural_rr.py
asserts PSNR beats the RELAX output at equal rpp on a held-out view).

Select with RenderConfig(denoiser=Denoiser.NEURAL). Like the reference's RR
path, it REPLACES the NRD-style denoisers (and TAA duty — the recurrent
history does the temporal part).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "neural_rr.npz")

# noisy composed(3) + diff_albedo(3) + spec_albedo(3) + normal_roughness(4)
# + depth(1) + prev_denoised(3) + prev_valid(1)
C_IN = 18
HIDDEN = 32
# à-trous-style dilations: the receptive field must rival RELAX's 31x31
# wavelet chain at 1 spp, or the net cannot gather enough samples to win
DILATIONS = (1, 2, 4, 8)
# kernel-predicting head (KPN-lite): the net outputs softmax weights over a
# dilated 5x5 tap grid of the NOISY input plus a temporal blend logit —
# averaging-only outputs are variance-bounded and train far better at 1 spp
# than direct residuals
TAP_DIL = 2
TAP_OFFS = [(dy, dx) for dy in (-2, -1, 0, 1, 2) for dx in (-2, -1, 0, 1, 2)]
C_OUT = len(TAP_OFFS) + 1   # 25 kernel logits + 1 temporal alpha
LAYERS = len(DILATIONS) + 1  # trunk + 3x3 head


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NeuralRRHistory:
    color: jnp.ndarray   # (H, W, 3) previous denoised output
    valid: jnp.ndarray   # () int32: 0 on first frame

    @staticmethod
    def create(h: int, w: int, dtype=jnp.float32) -> "NeuralRRHistory":
        return NeuralRRHistory(color=jnp.zeros((h, w, 3), dtype),
                               valid=jnp.int32(0))


def init_params(key) -> dict:
    shapes = [(3, 3, C_IN, HIDDEN)] + \
             [(3, 3, HIDDEN, HIDDEN)] * (LAYERS - 2) + [(3, 3, HIDDEN, C_OUT)]
    ks = jax.random.split(key, LAYERS)
    params = {}
    for i, (k, shp) in enumerate(zip(ks, shapes)):
        fan_in = shp[0] * shp[1] * shp[2]
        w = jax.random.normal(k, shp, jnp.float32) * np.sqrt(2.0 / fan_in)
        if i == LAYERS - 1:
            # zero head: uniform softmax (= box blur of the taps), temporal
            # alpha sigmoid(-2) ~ 0.12 — a sane denoiser before training
            w = jnp.zeros(shp, jnp.float32)
        params[f"w{i}"] = w
        b = jnp.zeros((shp[3],), jnp.float32)
        if i == LAYERS - 1:
            b = b.at[-1].set(-2.0)
        params[f"b{i}"] = b
    return params


def save_weights(params: dict, path: str = WEIGHTS_PATH):
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_weights(path: str = WEIGHTS_PATH) -> dict | None:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def _conv(x, w, b, dilation: int = 1):
    y = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    return y + b


def apply(params: dict, noisy: jnp.ndarray, guides: dict,
          prev: jnp.ndarray, prev_valid) -> jnp.ndarray:
    """Denoise (H, W, 3) noisy composed radiance.

    guides: image-shaped diff_albedo (H,W,3), spec_albedo (H,W,3),
    normal_roughness (H,W,4), depth (H,W). prev: (H,W,3) reprojected previous
    output; prev_valid: scalar {0,1}."""
    v = jnp.broadcast_to(
        jnp.asarray(prev_valid, noisy.dtype), noisy.shape[:2]
    )[..., None]
    x = jnp.concatenate([
        noisy, guides["diff_albedo"], guides["spec_albedo"],
        guides["normal_roughness"], guides["depth"][..., None],
        prev * v, v,
    ], axis=-1)
    for i in range(LAYERS):
        d = DILATIONS[i] if i < len(DILATIONS) else 1
        x = _conv(x, params[f"w{i}"], params[f"b{i}"], dilation=d)
        if i < LAYERS - 1:
            x = jax.nn.relu(x)
    k = jax.nn.softmax(x[..., :len(TAP_OFFS)], axis=-1)
    alpha = jax.nn.sigmoid(x[..., -1:]) * v

    def shifted(a, dy, dx):
        h, w = a.shape[:2]
        pt, pb = max(-dy, 0), max(dy, 0)
        pl_, pr = max(-dx, 0), max(dx, 0)
        p = jnp.pad(a, ((pt, pb), (pl_, pr), (0, 0)), mode="edge")
        return p[pb:pb + h, pr:pr + w]

    filtered = jnp.zeros_like(noisy)
    for i, (dy, dx) in enumerate(TAP_OFFS):
        filtered = filtered + shifted(
            noisy, dy * TAP_DIL, dx * TAP_DIL) * k[..., i:i + 1]
    out = filtered * (1.0 - alpha) + prev * alpha
    return jnp.maximum(out, 0.0)


def denoise(params: dict, noisy: jnp.ndarray, guides: dict, mv_xy: jnp.ndarray,
            hist: NeuralRRHistory, reset=False):
    """One recurrent step: reproject the previous output, denoise, update
    history. Returns (denoised, new history)."""
    from nrdsample_tpu.denoise import common

    prev = common.reproject(hist.color, mv_xy)
    valid = jnp.where(
        jnp.logical_or(reset, hist.valid == 0), jnp.int32(0), jnp.int32(1)
    )
    out = apply(params, noisy, guides, prev, valid)
    return out, NeuralRRHistory(color=out, valid=jnp.int32(1))
