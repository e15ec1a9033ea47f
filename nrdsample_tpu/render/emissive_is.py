"""Emissive importance sampling — the light-BVH reservoir of the reference.

Reference (RaytracingShared.hlsli:750-839 + CastLightRay_AnyHit at 283): up to
PT_IMPORTANCE_SAMPLES_NUM(=16) BRDF-sampled candidate directions are probed
against the *emissive-only* TLAS (merged-emissive BLAS, NRDSample.cpp:2516-2523);
weighted reservoir sampling picks one proportional to the emissive intensity it
would reach, and the path throughput is scaled by
sumIntensity / (chosenIntensity * K), clamped to 8 (firefly suppression).
Occlusion is NOT tested here — the chosen ray is traced normally afterwards, so
blockers resolve naturally.

TPU shape: the candidate loop is a static python unroll of K dense
ray-vs-emissive-set intersections (E is tiny: <= 256 triangles), fully batched
over rays. Light intensity is a *sampling weight* -> detached from autodiff;
radiance gradients flow through the normal shading path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nrdsample_tpu.mathlib import color, geometry as geo, rng, sampling
from nrdsample_tpu.ops import intersect
from nrdsample_tpu.scene.types import Scene


def build_emissive_set(scene: Scene, emission_scale=1.0):
    """Gather the padded emissive-triangle subset: the light-BVH analogue.

    Returns dict with p0/e1/e2 (E, 3) (degenerate rows for padding) and
    intensity (E,) = luminance of the material emission.
    """
    ids = scene.emissive_tris
    valid = ids >= 0
    safe = jnp.maximum(ids, 0)
    tr = scene.tris
    mask = valid[:, None].astype(tr.p0.dtype)
    p0 = tr.p0[safe] * mask
    e1 = tr.e1[safe] * mask
    e2 = tr.e2[safe] * mask
    mat = tr.material[safe]
    inten = color.luminance(scene.materials.emission[mat]) * emission_scale
    inten = jnp.where(valid, inten, 0.0)
    return {"p0": p0, "e1": e1, "e2": e2, "intensity": inten, "any": scene.emissive_count > 0}


def light_probe(em: dict, origin: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """CastLightRay_AnyHit: intensity of the nearest emissive surface along the
    ray (0 on miss). Dense closest-hit against the emissive set."""
    t, _, _, hit = intersect._mt_intersect(
        origin[:, None, :], direction[:, None, :],
        em["p0"][None], em["e1"][None], em["e2"][None],
    )
    t = jnp.where(hit, t, intersect.T_MAX)
    arg = jnp.argmin(t, axis=-1)
    tmin = jnp.take_along_axis(t, arg[:, None], axis=-1)[:, 0]
    inten = em["intensity"][arg]
    return jnp.where(tmin < intersect.T_MAX, inten, 0.0)


def reservoir_sample_direction(props: dict, em: dict, is_diffuse: jnp.ndarray,
                               pixel_idx, frame, dim: int, n_candidates: int,
                               trim, spec_k_scale: jnp.ndarray | None = None):
    """Pick a bounce direction by weighted reservoir over K BRDF candidates.

    spec_k_scale: per-ray fraction in [0,1] scaling the candidate count for
    specular lobes (GetSpecMagicCurve coupling, TraceOpaque.cs.hlsl:213).
    Returns (ray_local [N,3], throughput_multiplier [N]).
    """
    n = props["n"]
    v_local = sampling.to_local(props["v"], n)
    x = props["x"]
    # origin slightly off the surface (visibility not tested, but avoid self-hit
    # of the emitter's own backface)
    origin = x + props["n_geom"] * 1e-4

    k_eff = jnp.full(x.shape[:-1], float(n_candidates))
    if spec_k_scale is not None:
        k_spec = jnp.ceil(n_candidates * jnp.clip(spec_k_scale, 0.0, 1.0))
        k_eff = jnp.where(is_diffuse, k_eff, jnp.maximum(k_spec, 1.0))

    sum_i = jnp.zeros(x.shape[:-1])
    chosen_i = jnp.ones(x.shape[:-1])
    ray_local = jnp.zeros_like(x)

    # candidate loop as lax.scan (compile-cost: one body, not K unrolled
    # probes); identical math/order to the unrolled form — at k==0 the first
    # candidate seeds the reservoir unconditionally
    def body(carry, k):
        sum_i, chosen_i, ray_local = carry
        rnd = rng.uniform2(pixel_idx, frame, dim + 3 * k)
        cand_diff = sampling.cosine_ray(rnd)
        h = sampling.vndf_ggx(rnd, v_local, props["roughness"], trim)
        cand_spec = geo.reflect(-v_local, h)
        cand = jnp.where(is_diffuse[..., None], cand_diff, cand_spec)
        active = k < k_eff
        cand_world = sampling.to_world(cand, n)
        li = light_probe(em, origin, cand_world) * active
        sum_i = sum_i + li
        take_rnd = rng.uniform1(pixel_idx, frame, dim + 3 * k + 2)
        take = (li > 0.0) & (take_rnd < li / jnp.maximum(sum_i, 1e-9))
        ray_local = jnp.where((take | (k == 0))[..., None], cand, ray_local)
        chosen_i = jnp.where(take, li, chosen_i)
        return (sum_i, chosen_i, ray_local), None

    (sum_i, chosen_i, ray_local), _ = jax.lax.scan(
        body, (sum_i, chosen_i, ray_local),
        jnp.arange(n_candidates, dtype=jnp.int32),
    )

    mult = sum_i / (chosen_i * jnp.maximum(k_eff, 1.0))
    mult = jnp.minimum(mult, 8.0)  # firefly clamp (RaytracingShared.hlsli:836)
    mult = jnp.where(sum_i > 0.0, mult, 1.0)
    return ray_local, jax.lax.stop_gradient(mult)
