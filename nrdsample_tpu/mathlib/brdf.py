"""GGX microfacet BRDF, Fresnel, environment terms — ml.hlsli ``BRDF::*`` equivalents.

Used for throughput updates (RaytracingShared.hlsli:841-899), diffuse-probability
estimation (RaytracingShared.hlsli:980-1009) and de-modulation factors
(RaytracingShared.hlsli:927-949).
"""

from __future__ import annotations

import jax.numpy as jnp

from nrdsample_tpu.mathlib.sampling import PI, ggx_d, smith_g1


def fresnel_schlick(f0: jnp.ndarray, v_dot_h: jnp.ndarray) -> jnp.ndarray:
    """Schlick Fresnel; f0 [..., 3] (color), v_dot_h [...] (scalar per element)."""
    m = jnp.clip(1.0 - v_dot_h, 0.0, 1.0)
    m2 = m * m
    w = (m2 * m2 * m)[..., None]  # broadcast over the trailing color axis of f0
    return f0 + (1.0 - f0) * w

def smith_g2_correlated(n_dot_v, n_dot_l, alpha):
    """Height-correlated Smith masking-shadowing, divided by (4 NoV NoL): returns G2_vis."""
    a2 = jnp.asarray(alpha) ** 2
    nv = jnp.maximum(n_dot_v, 1e-6)
    nl = jnp.maximum(n_dot_l, 1e-6)
    lv = nl * jnp.sqrt(a2 + (1.0 - a2) * nv * nv)
    ll = nv * jnp.sqrt(a2 + (1.0 - a2) * nl * nl)
    return 0.5 / jnp.maximum(lv + ll, 1e-9)


def ggx_specular(n, v, l, roughness, f0):
    """Full specular BRDF value f_s(v,l) [..., 3] (not cosine-weighted)."""
    alpha = jnp.asarray(roughness) ** 2
    h = _normalize(v + l)
    n_dot_v = jnp.sum(n * v, axis=-1)
    n_dot_l = jnp.sum(n * l, axis=-1)
    n_dot_h = jnp.sum(n * h, axis=-1)
    v_dot_h = jnp.sum(v * h, axis=-1)
    d = ggx_d(n_dot_h, alpha)
    g_vis = smith_g2_correlated(n_dot_v, n_dot_l, alpha)
    f = fresnel_schlick(f0, jnp.maximum(v_dot_h, 0.0))
    active = (n_dot_l > 0.0) & (n_dot_v > 0.0)
    return jnp.where(active[..., None], f * (d * g_vis)[..., None], 0.0)


def diffuse_lambert(albedo: jnp.ndarray) -> jnp.ndarray:
    """Lambert BRDF value (not cosine-weighted)."""
    return albedo / PI


def base_color_to_f0_albedo(base_color: jnp.ndarray, metalness: jnp.ndarray):
    """Metalness workflow split: (albedo, f0). BRDF::ConvertBaseColorMetalnessToAlbedoRf0."""
    m = metalness[..., None]
    f0 = 0.04 * (1.0 - m) + base_color * m
    albedo = base_color * (1.0 - m)
    return albedo, f0


def environment_term_rtg(f0: jnp.ndarray, n_dot_v: jnp.ndarray, roughness: jnp.ndarray) -> jnp.ndarray:
    """Split-sum preintegrated environment BRDF approximation (Ray Tracing Gems).

    ml.hlsli BRDF::EnvironmentTerm_Rtg — used for demodulation
    (RaytracingShared.hlsli:927-949) and DLSS guide albedo (DlssBefore.cs.hlsl:44).
    """
    m = jnp.clip(roughness, 0.0, 1.0) ** 2
    nv = jnp.clip(n_dot_v, 0.0, 1.0)
    x = 1.0 - nv
    x2 = x * x
    x4 = x2 * x2
    bias = jnp.exp2(-(7.0 * nv + 4.0 * m)) * m
    scale = 1.0 - bias - m * jnp.maximum(bias, jnp.minimum(jnp.sqrt(m), x4 * x))
    return jnp.clip(f0 * scale[..., None] + bias[..., None], 0.0, 1.0)


def estimate_diffuse_probability(albedo, f0, roughness, n_dot_v, eps: float = 1e-3):
    """Probability of choosing the diffuse lobe (RaytracingShared.hlsli:980-1009).

    luminance(albedo) vs luminance(env specular term); clamped away from 0/1.
    """
    from nrdsample_tpu.mathlib.color import luminance

    f_env = environment_term_rtg(f0, n_dot_v, roughness)
    lum_d = luminance(albedo * (1.0 - f_env))
    lum_s = luminance(f_env)
    p = lum_d / jnp.maximum(lum_d + lum_s, 1e-9)
    p = jnp.where((lum_d < eps) & (lum_s > 0.0), 0.0, p)
    p = jnp.where(lum_s < eps, 1.0, p)
    return jnp.clip(p, 0.0, 1.0)


def _normalize(v):
    from nrdsample_tpu.mathlib.geometry import normalize

    return normalize(v)
