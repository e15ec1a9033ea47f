"""Hit decoding and material fetch — the CastRay hit-decode + GetMaterialProps
equivalents (RaytracingShared.hlsli:314-555).

`GeometryProps` / `MaterialProps` become dicts of batched arrays. The hit
triangle index is detached (discrete decision); everything recomputed here from
scene arrays (positions, normals, material parameters) stays differentiable so
gradients flow to scene parameters (SURVEY.md §7.1 "Differentiability").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nrdsample_tpu.mathlib import geometry as geo
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.render import lighting
from nrdsample_tpu.scene.types import Scene

T_MAX = traversal.T_MAX


def decode_hit(scene: Scene, hit: dict, origin: jnp.ndarray, direction: jnp.ndarray,
               sun_dir: jnp.ndarray, tan_sun_radius, white_furnace: bool = False,
               emission_scale=1.0, cone_width=None):
    """Build geometry+material props from a traversal result.

    Returns a dict with:
      miss, t, x, v, n (shading), n_geom, uv, mat (material id), view-facing n,
      base_color, roughness, metalness, lemi, albedo-ready fields.
    On miss: lemi = sky radiance along the ray, base_color = 0 — matching
    GetMaterialProps miss handling so the path loop can just read Lemi.
    """
    tri = jnp.maximum(hit["tri"], 0)
    miss = hit["tri"] < 0
    u = hit["u"]
    v_bc = hit["v"]
    t = hit["t"]

    tr = scene.tris
    p0 = tr.p0[tri]
    e1 = tr.e1[tri]
    e2 = tr.e2[tri]
    # differentiable hit position from detached (t, u, v): prefer barycentric
    # reconstruction so vertex-position gradients flow
    x = p0 + u[..., None] * e1 + v_bc[..., None] * e2
    x = jnp.where(miss[..., None], origin + direction * T_MAX, x)

    w = 1.0 - u - v_bc
    n_smooth = geo.normalize(
        w[..., None] * tr.n0[tri] + u[..., None] * tr.n1[tri] + v_bc[..., None] * tr.n2[tri]
    )
    n_geom = geo.normalize(jnp.cross(e1, e2))
    view = -direction  # V points away from the surface toward the previous vertex

    # two-sided: flip normals to face the incoming ray (the reference renders
    # two-sided since RayFlags==0 and normals get flipped in CastRay's decode)
    flip = jnp.sign(geo.dot3(n_geom, view))[..., None]
    n_geom = n_geom * flip
    n_smooth = n_smooth * jnp.sign(geo.dot3(n_smooth, view))[..., None]

    uv = (
        w[..., None] * tr.uv0[tri] + u[..., None] * tr.uv1[tri] + v_bc[..., None] * tr.uv2[tri]
    )

    mat = tr.material[tri]
    mats = scene.materials
    base_color = mats.base_color[mat]
    roughness = mats.roughness[mat]
    metalness = mats.metalness[mat]
    emission = mats.emission[mat] * emission_scale
    flags = mats.flags[mat]

    # material textures with ray-cone mip (GetMaterialProps' 4 bindless
    # fetches, RaytracingShared.hlsli:424-555; LOD :154-189). Texture values
    # MULTIPLY the material constants (glTF convention); texels are pytree
    # leaves so gradients flow into them (differentiable texture optimization)
    mip = jnp.zeros_like(t)
    if scene.textures is not None:
        from nrdsample_tpu.render import raycone
        from nrdsample_tpu.scene import textures as tex_mod

        ts = scene.textures
        if cone_width is not None:
            uva = raycone.uv_area(tr.uv0[tri], tr.uv1[tri], tr.uv2[tri])
            mip = raycone.texture_mip(
                cone_width, tr.world_area[tri], uva,
                geo.dot3(n_geom, view), ts.base_res, max_mip=ts.n_mips - 1.0,
            )
        texel = tex_mod.sample(ts, mat, uv, mip)
        base_color = base_color * texel[..., 0:3]
        roughness = roughness * texel[..., 5]
        metalness = metalness * texel[..., 6]
        emission = emission * texel[..., 7:8]

    if white_furnace:
        base_color = jnp.ones_like(base_color)
        emission = jnp.zeros_like(emission)

    sky = lighting.sky_intensity(direction, sun_dir, tan_sun_radius, white_furnace)
    lemi = jnp.where(miss[..., None], sky, emission)
    base_color = jnp.where(miss[..., None], 0.0, base_color)

    return {
        "miss": miss,
        "t": jnp.where(miss, T_MAX, t),
        "x": x,
        "v": view,
        "n": n_smooth,
        "n_geom": n_geom,
        "uv": uv,
        "mat": mat,
        "tri": hit["tri"],
        "base_color": base_color,
        "roughness": roughness,
        "metalness": metalness,
        "lemi": lemi,
        "flags": flags,
        # curvature from vertex-normal divergence across the triangle edges
        # (RaytracingShared.hlsli:382-386): |dN|/|dX| per edge, worst edge
        "curvature": jnp.where(
            miss, 0.0,
            jnp.maximum(
                geo.length(tr.n1[tri] - tr.n0[tri]) * geo.positive_rcp(geo.length(e1)),
                geo.length(tr.n2[tri] - tr.n0[tri]) * geo.positive_rcp(geo.length(e2)),
            ),
        ),
        "mip": mip,
    }


def apply_overrides(props: dict, roughness_override, metalness_override) -> dict:
    """Settings-driven material overrides (UpdateConstantBuffer plumbs
    gRoughnessOverride/gMetalnessOverride; GetMaterialProps applies them)."""
    out = dict(props)
    out["roughness"] = jnp.clip(props["roughness"] + roughness_override, 0.0, 1.0)
    out["metalness"] = jnp.clip(props["metalness"] + metalness_override, 0.0, 1.0)
    return out
