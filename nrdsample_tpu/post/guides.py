"""Neural-upscaler guide buffers — DlssBefore.cs.hlsl parity.

The reference prepares guides for DLSS-SR/RR in DlssBefore.cs.hlsl:15-62:
  * SR: linear viewZ -> hardware post-projection depth (:28-33);
  * RR: diffuse albedo ``albedo * (1 - Fenv)``, specular albedo ``Fenv``
    (the preintegrated environment term), denormalized specular hit distance,
    and RGBA16f world normal + roughness (:36-62).

A learned denoiser/upscaler dropped into the SR slot consumes exactly this
dict; nothing here depends on one existing.
"""

from __future__ import annotations

import jax.numpy as jnp

from nrdsample_tpu.mathlib import brdf


def hw_depth(view_z: jnp.ndarray, near: float, far: float = 1e5) -> jnp.ndarray:
    """Linear viewZ -> reversed-Z style post-projection depth in [0, 1].

    DlssBefore.cs.hlsl:28-33 applies the projection's (z*a+b)/z mapping; with a
    standard infinite-far reversed-Z projection that is near/z.
    """
    z = jnp.maximum(jnp.abs(view_z), near)
    return jnp.clip(near / z, 0.0, 1.0)


def rr_guides(gb: dict, near: float, mv_type=None) -> dict:
    """Guide-buffer dict from the G-buffer (flat [N, ...] layout).

    mv_type (Settings.mvType): None/0 exports the screen-space 2.5D motion,
    1 exports world-space 3D motion (gb["mv_world"]) in the "mv" slot —
    matching the reference's gMvType switch for the upscaler inputs."""
    base_color = gb["base_color"]
    metalness = gb["metalness"]
    roughness = gb["roughness"]
    normal = gb["normal"]
    view_z = gb["view_z"]

    # f0 lerp(0.04, baseColor, metalness) as in GetMaterialProps
    # (RaytracingShared.hlsli:424-560)
    f0 = 0.04 * (1.0 - metalness[..., None]) + base_color * metalness[..., None]
    n_dot_v = jnp.clip(-jnp.sum(normal * gb.get("view_dir", normal), axis=-1), 0.05, 1.0)
    f_env = brdf.environment_term_rtg(f0, n_dot_v, roughness)

    albedo = base_color * (1.0 - metalness[..., None])
    return {
        "depth": hw_depth(view_z, near),
        "diff_albedo": albedo * (1.0 - f_env),
        "spec_albedo": f_env,
        "normal_roughness": jnp.concatenate(
            [normal, roughness[..., None]], axis=-1
        ),
        "spec_hitdist": gb.get("spec_hitdist", jnp.zeros_like(view_z)),
        "mv": (
            gb["mv"] if mv_type is None or "mv_world" not in gb
            else jnp.where(
                jnp.asarray(mv_type, jnp.int32) > 0, gb["mv_world"], gb["mv"]
            )
        ),
    }
