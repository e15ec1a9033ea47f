"""Analytic sun/sky model + direct lighting + shadow rays.

Equivalents of GetSunIntensity / GetSkyIntensity (Shared.hlsli:424-474) and
GetLighting (RaytracingShared.hlsli:562-697). The sky is the very simple
procedural model of the reference: sun disk with glow, scatter-tinted gradient
sky, ground darkening.
"""

from __future__ import annotations

import jax.numpy as jnp

from nrdsample_tpu import config as cfg
from nrdsample_tpu.mathlib import brdf, color, geometry as geo, rng, sampling
from nrdsample_tpu.ops import traversal


def sun_intensity(v: jnp.ndarray, sun_dir: jnp.ndarray, tan_angular_radius,
                  white_furnace: bool = False) -> jnp.ndarray:
    """Radiance of the sun disk (+glow) seen along v. Shared.hlsli:427-453."""
    if white_furnace:
        return jnp.zeros(v.shape[:-1] + (3,), v.dtype)
    b = geo.dot3(v, sun_dir)
    d = geo.length(v - sun_dir * b[..., None])
    glow = jnp.clip(1.015 - d, 0.0, 1.0)
    glow = glow * (b * 0.5 + 0.5) * 0.6
    a = geo.sqrt01(1.0 - b * b) / jnp.where(jnp.abs(b) < 1e-6, 1e-6, b)
    sun = 1.0 - geo.smoothstep(
        tan_angular_radius * 0.9, tan_angular_radius * 1.66 + 0.01, a
    )
    sun = sun * (b > 0.0)
    sun = sun * (1.0 - geo.pow01(1.0 - v[..., 2], 4.85))
    sun = sun * geo.smoothstep(0.0, 0.1, sun_dir[2])
    sun = sun + glow
    sun_color = jnp.stack(
        [jnp.ones_like(sun), jnp.full_like(sun, 0.6), jnp.full_like(sun, 0.3)], axis=-1
    )
    warm = jnp.array([1.0, 0.9, 0.7])
    t = geo.sqrt01(sun_dir[2])
    sun_color = (1 - t) * sun_color + t * warm
    sun_color = sun_color * sun[..., None]
    sun_color = sun_color * geo.smoothstep(-0.01, 0.05, sun_dir[2])
    return color.from_gamma(sun_color) * cfg.SUN_INTENSITY


def sky_intensity(v: jnp.ndarray, sun_dir: jnp.ndarray, tan_angular_radius,
                  white_furnace: bool = False) -> jnp.ndarray:
    """Sky radiance along v (includes sun disk). Shared.hlsli:455-474."""
    if white_furnace:
        return jnp.ones(v.shape[:-1] + (3,), v.dtype)
    atmosphere = geo.sqrt01(1.0 - jnp.clip(v[..., 2], 0.0, 1.0))
    scatter = geo.pow01(sun_dir[2], 1.0 / 15.0)
    scatter = 1.0 - jnp.clip(scatter, 0.8, 1.0)
    scatter_color = jnp.array([1.0, 1.0, 1.0]) * (1 - scatter) + jnp.array([1.5, 0.45, 0.0]) * scatter
    base = jnp.array([0.2, 0.4, 0.8])
    w = (atmosphere / 1.3)[..., None]
    sky = base * (1 - w) + scatter_color * w
    sky = sky * jnp.clip(1.0 + sun_dir[2], 0.0, 1.0)
    ground = 0.5 + 0.5 * geo.smoothstep(-1.0, 0.0, v[..., 2])
    sky = sky * ground[..., None]
    return color.from_gamma(sky) * cfg.SKY_INTENSITY + sun_intensity(
        v, sun_dir, tan_angular_radius
    )


def sun_basis(sun_dir: jnp.ndarray):
    """Orthonormal basis perpendicular to the sun direction (gSunBasisX/Y)."""
    t, b = geo.orthonormal_basis(sun_dir[None, :])
    return t[0], b[0]


def direct_sun_lighting(n, v, base_color, metalness, roughness, sun_dir,
                        tan_angular_radius, white_furnace: bool = False,
                        flags=None, tangent=None):
    """Unshadowed sun + pseudo-sky-IS lighting at a surface — the LIGHTING part
    of GetLighting (RaytracingShared.hlsli:569-667). When `flags` is given,
    FLAG_HAIR surfaces use the far-field hair BCSDF and FLAG_SKIN surfaces the
    SSS wrap-diffuse (the RTXCR paths at :593,635-660).

    Returns radiance [..., 3]; multiply by a shadow term separately.
    """
    csun = sun_intensity(sun_dir[None, :], sun_dir, tan_angular_radius, white_furnace)[0]
    csky = sky_intensity(-v, sun_dir, tan_angular_radius, white_furnace)
    n_dot_l = jnp.clip(geo.dot3(n, sun_dir), 0.0, 1.0)
    shadow_fade = geo.smoothstep(0.03, 0.1, n_dot_l)

    albedo, f0 = brdf.base_color_to_f0_albedo(base_color, metalness)
    # pseudo sky importance sampling: rough surfaces favor sun color
    t = geo.smoothstep(0.0, 0.2, roughness)[..., None]
    cimp = csky * (1 - t) + csun * t
    cimp = cimp * geo.smoothstep(-0.01, 0.05, sun_dir[2])

    l = sun_dir
    h = geo.normalize(l + v)
    n_dot_h = jnp.clip(geo.dot3(n, h), 0.0, 1.0)
    v_dot_h = jnp.clip(geo.dot3(v, h), 0.0, 1.0)
    n_dot_v = jnp.abs(geo.dot3(n, v))

    alpha = roughness**2
    d = sampling.ggx_d(n_dot_h, alpha)
    g_vis = brdf.smith_g2_correlated(n_dot_v, n_dot_l, alpha)
    f = brdf.fresnel_schlick(f0, v_dot_h)
    cspec = jnp.clip(f * (d * g_vis * n_dot_l)[..., None], 0.0, 1.0)
    cdiff = (csun * albedo) * n_dot_l[..., None] / sampling.PI

    lighting = cspec * cimp + cdiff * (1.0 - f)
    lighting = lighting * shadow_fade[..., None]

    if flags is not None:
        from nrdsample_tpu import config as cfgmod
        from nrdsample_tpu.render import hair_sss

        is_skin = (flags & cfgmod.FLAG_SKIN) != 0
        if tangent is None:
            # fiber direction fallback: any tangent of the shading normal
            tangent, _ = geo.orthonormal_basis(n)
        is_hair = (flags & cfgmod.FLAG_HAIR) != 0

        sss = csun * albedo * hair_sss.sss_wrap_diffuse(
            geo.dot3(n, sun_dir), base_color
        ) / sampling.PI
        lighting = jnp.where(is_skin[..., None], sss + cspec * cimp, lighting)

        bcsdf = hair_sss.hair_bcsdf_eval(sun_dir, v, tangent, base_color, roughness)
        hair_l = csun * bcsdf * jnp.clip(
            geo.dot3(n, sun_dir) * 0.5 + 0.5, 0.0, 1.0
        )[..., None]
        lighting = jnp.where(is_hair[..., None], hair_l, lighting)
    return lighting


def sun_shadow_ray_params(x, n, sun_dir, tan_angular_radius,
                          pixel_idx, frame, unproject, view_z, dim: int = 7000,
                          rnd=None):
    """Jittered sun-cone visibility ray (origin, direction) — the ray setup of
    GetLighting's SHADOW part (RaytracingShared.hlsli:675-687), split out so
    callers can BATCH shadow rays with bounce rays into one traversal launch.

    rnd: optional (n, 2) disc sample override — trace_opaque passes blue noise
    here when USE_BLUE_NOISE_FOR_SHADOWS applies (TraceOpaque.cs.hlsl:767-770);
    default is the white PCG stream."""
    if rnd is None:
        rnd = rng.uniform2(pixel_idx, frame, dim)
    disk = sampling.cosine_ray(rnd)[..., :2] * tan_angular_radius
    bx, by = sun_basis(sun_dir)
    sdir = geo.normalize(
        bx * disk[..., 0:1] + by * disk[..., 1:2] + sun_dir
    )
    xo = geo.offset_ray(x, n, view_z, unproject, cfg.PT_SHADOW_RAY_OFFSET)
    return xo, sdir


def sun_shadow_ray(ctx: traversal.TraceContext, x, n, sun_dir, tan_angular_radius,
                   pixel_idx, frame, unproject, view_z, dim: int = 7000):
    """Cast one jittered sun-cone visibility ray per element (the SHADOW part of
    GetLighting, RaytracingShared.hlsli:675-687). Returns visibility in {0,1}."""
    xo, sdir = sun_shadow_ray_params(
        x, n, sun_dir, tan_angular_radius, pixel_idx, frame, unproject, view_z, dim
    )
    blocked = traversal.any_hit(ctx, xo, sdir, jnp.full(x.shape[:-1], traversal.T_MAX))
    return 1.0 - blocked.astype(x.dtype)
