"""Final pass — Final.cs.hlsl parity, plus the DlssAfter tonemap.

Final.cs.hlsl:11-63 at output resolution:
  * split-screen: pixels left of ``separator * W`` show the noisy (pre-denoise)
    image, right side the denoised one, with an NV-green divider column
    (:28-44);
  * dithering before 8-bit quantization (:31-35);
  * optional NRD validation-overlay alpha blend (:46-51);
  * sRGB OETF when the swapchain is not HDR (:58-60).

DlssAfter.cs.hlsl:7-22 is the in-place Uncharted tonemap applied after the
upscaler at output resolution — ``tonemap_output`` here.
"""

from __future__ import annotations

import jax.numpy as jnp

from nrdsample_tpu.mathlib import color, rng

import numpy as _np

NV_GREEN = _np.array([118.0 / 255.0, 185.0 / 255.0, 0.0], _np.float32)


def tonemap_output(hdr: jnp.ndarray, exposure) -> jnp.ndarray:
    """DlssAfter.cs.hlsl:7-22: exposure + Uncharted curve at output res."""
    return color.tonemap_uncharted(hdr * exposure)


def final_pass(denoised: jnp.ndarray, noisy: jnp.ndarray | None = None,
               separator=0.0, validation: jnp.ndarray | None = None,
               frame_index=0, srgb: bool = True, dither: bool = True) -> jnp.ndarray:
    """(H, W, 3) tonemapped color -> display-ready [0, 1] image."""
    h, w = denoised.shape[:2]
    out = denoised

    # split-screen (Final.cs.hlsl:28-44); separator==0 disables
    x = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    sep_x = separator * w
    if noisy is not None:
        out = jnp.where(x < sep_x, noisy, out)

    # NRD validation overlay blend (Final.cs.hlsl:46-51)
    if validation is not None:
        out = out * (1.0 - validation[..., 3:]) + validation[..., :3] * validation[..., 3:]

    if srgb:
        out = color.linear_to_srgb(jnp.clip(out, 0.0, 1.0))

    # divider column in display space (NV_GREEN is an 8-bit sRGB constant)
    if noisy is not None:
        on_divider = (jnp.abs(x - sep_x) < 1.0) & (separator > 0.0)
        out = jnp.where(on_divider, NV_GREEN, out)

    # dither before quantization (Final.cs.hlsl:31-35): +-0.5/255 white noise
    if dither:
        pix = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
        u = rng.uniform1(pix, frame_index, 977)
        out = out + (u[..., None] - 0.5) * (1.0 / 255.0)

    return jnp.clip(out, 0.0, 1.0)
