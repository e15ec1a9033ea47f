"""Importance sampling — ml.hlsli ``ImportanceSampling::{Cosine, VNDF}`` equivalents.

All samplers take uniform [0,1)² inputs and return local-space (z-up hemisphere)
directions plus PDFs, or world-space when given a basis. Used by
GenerateRayAndUpdateThroughput parity (RaytracingShared.hlsli:725-921).
"""

from __future__ import annotations

import jax.numpy as jnp

from nrdsample_tpu.mathlib import geometry as geo

TWO_PI = 6.283185307179586
PI = 3.141592653589793


def cosine_ray(rnd2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample (z-up local space), [..., 2] -> [..., 3]."""
    phi = rnd2[..., 0] * TWO_PI
    cos_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - rnd2[..., 1]))
    sin_theta = jnp.sqrt(rnd2[..., 1])
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def cosine_pdf(cos_theta: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(cos_theta, 0.0) / PI


def uniform_sphere(rnd2: jnp.ndarray) -> jnp.ndarray:
    z = 1.0 - 2.0 * rnd2[..., 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * rnd2[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_cone(rnd2: jnp.ndarray, cos_apex) -> jnp.ndarray:
    """Uniform direction in a z-up cone with apex cosine cos_apex (sun sampling)."""
    cos_theta = 1.0 - rnd2[..., 0] * (1.0 - cos_apex)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta**2))
    phi = TWO_PI * rnd2[..., 1]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def vndf_ggx(rnd2: jnp.ndarray, v_local: jnp.ndarray, roughness, trim: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """Sample the GGX visible-normal distribution (Heitz 2018), z-up local space.

    v_local: view direction toward the camera in tangent space [..., 3].
    roughness: perceptual roughness; alpha = roughness². `trim` scales the sampled
    disk to trim the lobe tail (PT_SPEC_LOBE_ENERGY=0.95, Shared.hlsli:113 —
    ImportanceSampling::VNDF::GetRay's trim factor).
    Returns the sampled *half-vector* m (caller reflects).
    """
    alpha = jnp.asarray(roughness) ** 2
    a = jnp.stack(
        [alpha * v_local[..., 0], alpha * v_local[..., 1], v_local[..., 2]], axis=-1
    )
    vh = geo.normalize(a)
    # orthonormal basis around vh
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        jnp.stack([-vh[..., 1], vh[..., 0], jnp.zeros_like(lensq)], axis=-1)
        / jnp.sqrt(jnp.maximum(lensq, 1e-12))[..., None],
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), vh.shape),
    )
    t2 = jnp.cross(vh, t1)
    r = jnp.sqrt(jnp.maximum(rnd2[..., 0], 0.0)) * jnp.asarray(trim)
    phi = TWO_PI * rnd2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * jnp.sqrt(jnp.maximum(0.0, 1.0 - p1**2)) + s * p2
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1**2 - p2**2))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + pz[..., None] * vh
    m = jnp.stack(
        [
            alpha * nh[..., 0],
            alpha * nh[..., 1],
            jnp.maximum(nh[..., 2], 1e-6),
        ],
        axis=-1,
    )
    return geo.normalize(m)


def ggx_vndf_pdf(v_local: jnp.ndarray, m_local: jnp.ndarray, roughness) -> jnp.ndarray:
    """PDF of vndf_ggx in *half-vector* measure: D_vis(m) = G1(v) |v.m| D(m) / |v.n|."""
    alpha = jnp.asarray(roughness) ** 2
    n_dot_v = jnp.maximum(jnp.abs(v_local[..., 2]), 1e-6)
    d = ggx_d(m_local[..., 2], alpha)
    g1 = smith_g1(n_dot_v, alpha)
    v_dot_m = jnp.maximum(jnp.sum(v_local * m_local, axis=-1), 0.0)
    return g1 * v_dot_m * d / n_dot_v


def ggx_d(n_dot_m: jnp.ndarray, alpha) -> jnp.ndarray:
    a2 = jnp.asarray(alpha) ** 2
    c = jnp.maximum(n_dot_m, 0.0)
    denom = c * c * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(PI * denom * denom, 1e-15)


def smith_g1(n_dot_v: jnp.ndarray, alpha) -> jnp.ndarray:
    a2 = jnp.asarray(alpha) ** 2
    c = jnp.maximum(n_dot_v, 1e-6)
    return 2.0 * c / (c + jnp.sqrt(a2 + (1.0 - a2) * c * c))


def to_world(local: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Rotate a z-up local direction into the hemisphere around world normal n."""
    t, b = geo.orthonormal_basis(n)
    return (
        local[..., 0:1] * t + local[..., 1:2] * b + local[..., 2:3] * n
    )


def to_local(world: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    t, b = geo.orthonormal_basis(n)
    return jnp.stack(
        [geo.dot3(world, t), geo.dot3(world, b), geo.dot3(world, n)], axis=-1
    )
