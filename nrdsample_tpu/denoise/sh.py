"""SH (spherical-gaussian) mode resolve — NRD_MODE == SH support.

Reference: in SH mode the tracer additionally outputs the first-bounce sampling
direction per lobe (TraceOpaque.cs.hlsl:227-234, accumulated and normalized at
470-473); the denoiser filters (radiance, direction) pairs, and Composition
performs an SG resolve with neighborhood re-jitter (Composition.cs.hlsl:95-123)
that re-sharpens lighting using the actual surface normal — recovering detail a
scalar-irradiance denoise blurs away.

Encoding here: an L1-band SH pair per lobe — rgb radiance + luminance-weighted
mean direction. The resolve evaluates the SG approximation of the clamped-cosine
convolution at the shading normal.
"""

from __future__ import annotations

import jax.numpy as jnp

from nrdsample_tpu.mathlib import color, geometry as geo


def pack(radiance: jnp.ndarray, direction: jnp.ndarray):
    """(N,3) radiance + (N,3) direction -> sh dict (filterable planes)."""
    w = color.luminance(radiance)
    return {"radiance": radiance, "dir": direction * w[..., None]}


def resolve(sh: dict, normal: jnp.ndarray, roughness: jnp.ndarray | None = None,
            is_spec: bool = False) -> jnp.ndarray:
    """SG resolve at the shading normal.

    The denoised mean direction tells where the filtered radiance actually came
    from; modulating by the (re-normalized) cosine between that direction and
    the per-pixel normal restores directional contrast (the reference's
    ResolveSH): out = radiance * saturate(dot(dir, N)) / E[cos] with a floor to
    stay energy-preserving when the direction is noisy/short.
    """
    d = sh["dir"]
    dlen = geo.length(d)
    dn = d * geo.positive_rcp(dlen)[..., None]
    cos = jnp.clip(geo.dot3(dn, normal), 0.0, 1.0)
    # confidence = |mean dir| relative to radiance luminance: short vectors mean
    # widely-spread directions -> fall back to flat irradiance
    lum = color.luminance(sh["radiance"])
    conf = jnp.clip(dlen / jnp.maximum(lum, 1e-6), 0.0, 1.0)
    scale = 1.0 + conf * (2.0 * cos - 1.0)
    return sh["radiance"] * jnp.maximum(scale, 0.0)[..., None]
