"""SharcUpdate — the 1/5-resolution cache-population tracer.

Reference: Shaders/SharcUpdate.cs.hlsl (250 LoC): at SHARC_DOWNSCALE=5 reduced
resolution, trace a primary ray (+ delta chain) then up to
SHARC_PROPAGATION_DEPTH=4 propagation bounces, calling SharcUpdateHit at every
vertex so each cache cell accumulates the full outgoing radiance estimate from
the remainder of the path (20-220). The PREV-frame gradient retrace (222-250)
feeds history confidence — see render/confidence.py.

Wavefront form: forward-trace recording per-vertex (position, normal, direct
light, segment throughput), then a backward sweep composes suffix radiances and
one batched scatter updates the hash grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nrdsample_tpu import config as cfgmod
from nrdsample_tpu.config import RenderConfig, Settings
from nrdsample_tpu.mathlib import color, geometry as geo, rng, sampling
from nrdsample_tpu.ops import sharc, traversal
from nrdsample_tpu.render import gbuffer, lighting
from nrdsample_tpu.scene import camera as cam_mod
from nrdsample_tpu.scene.types import Camera, Scene


def _trace_probe_paths(ctx: traversal.TraceContext, scene: Scene, cam: Camera,
                       cfg: RenderConfig, settings: Settings, frame,
                       sidx=None):
    """Trace the 1/ds-res probe paths for frame index `frame` with THAT
    frame's RNG streams and camera matrices. Pure function of (scene, cam,
    settings, frame) — re-invoking it with a PREVIOUS frame index replays the
    previous frame's exact paths under CURRENT lighting, which is the
    reference's gradient mechanism (SharcUpdate.cs.hlsl:222-250: Trace(PREV)
    with the prev-frame RNG seed).

    sidx: optional (m,) probe-grid indices — under pixel sharding each device
    traces its own contiguous probe slice (sharc_update_pass gathers the
    results back to the full grid). Default: the whole grid.

    Returns (first_l (m,3), probe_vz (m,), probe_n (m,3),
    verts (depth, m, ...) stacked per-vertex records pre-flatten)."""
    ds = cfg.sharc_downscale
    sw, sh = max(cfg.width // ds, 1), max(cfg.height // ds, 1)
    n_px = sw * sh
    sun_dir = cfgmod.sun_direction(settings)
    tan_sun = jnp.tan(jnp.deg2rad(settings.sun_angular_diameter * 0.5))
    unproject = cam_mod.unproject_scale(cam, cfg.height)

    # map the low-res grid onto full-res pixels, rotating the sub-pixel offset
    # per frame so the cache sees all positions over time (SharcUpdate's
    # jittered downscale grid)
    if sidx is None:
        sidx = jnp.arange(n_px, dtype=jnp.int32)
    sx = sidx % sw
    sy = sidx // sw
    off = rng.hash_u32(sidx, frame, 9001)
    ox = (off[..., 0] % ds).astype(jnp.int32)
    oy = (off[..., 1] % ds).astype(jnp.int32)
    px = jnp.minimum(sx * ds + ox, cfg.width - 1)
    py = jnp.minimum(sy * ds + oy, cfg.height - 1)
    pixel_idx = py * cfg.width + px

    origin, direction, _ = cam_mod.camera_rays(
        cam, cfg.width, cfg.height, pixel_idx, frame, sample_dim=7
    )

    hit = traversal.closest_hit(ctx, origin, direction)
    props = gbuffer.decode_hit(
        scene, hit, origin, direction, sun_dir, tan_sun, cfg.use_white_furnace,
        settings.emission_intensity,
        forced_material=settings.forced_material,
    )

    alive = jnp.logical_not(props["miss"])
    probe_vz = cam_mod.world_to_view_z(cam, props["x"])
    probe_n = props["n"]

    # propagation as lax.scan (compile-cost: one traced bounce body), stacking
    # per-vertex records; the backward suffix sweep is a reverse scan
    def fwd_body(carry, bounce):
        props, alive = carry
        dim = 800_000 + 1000 * bounce
        # direct lighting at this vertex
        view_z = cam_mod.world_to_view_z(cam, props["x"])
        direct = lighting.direct_sun_lighting(
            props["n"], props["v"], props["base_color"], props["metalness"],
            props["roughness"], sun_dir, tan_sun, cfg.use_white_furnace,
        )
        shadow = lighting.sun_shadow_ray(
            ctx, props["x"], props["n_geom"], sun_dir, tan_sun, pixel_idx, frame,
            unproject, view_z, dim=dim + 5,
        )
        shadow = jnp.where(settings.disable_shadows > 0, 1.0, shadow)
        l_direct = direct * shadow[..., None] + props["lemi"]

        # diffuse propagation (SHARC propagates the diffuse field)
        rnd = rng.uniform2(pixel_idx, frame, dim + 1)
        ray_local = sampling.cosine_ray(rnd)
        ray = sampling.to_world(ray_local, props["n"])
        # lambert cosine-sampled: per-segment throughput = diffuse albedo
        seg_w = props["base_color"] * (1.0 - props["metalness"][..., None])

        vert = {"x": props["x"], "n": props["n"], "l": l_direct, "w": seg_w,
                "alive": alive}

        xo = geo.offset_ray(
            props["x"], props["n_geom"], view_z, unproject, cfgmod.PT_BOUNCE_RAY_OFFSET
        )
        hit = traversal.closest_hit(ctx, xo, ray)
        props = gbuffer.decode_hit(
            scene, hit, xo, ray, sun_dir, tan_sun, cfg.use_white_furnace,
            settings.emission_intensity,
            forced_material=settings.forced_material,
        )
        alive = alive & jnp.logical_not(props["miss"])
        return (props, alive), vert

    depth = cfgmod.SHARC_PROPAGATION_DEPTH
    (props, alive), verts = jax.lax.scan(
        fwd_body, (props, alive), jnp.arange(depth, dtype=jnp.int32)
    )

    # tail: sky/emission seen by the last segment
    l_tail = props["lemi"]

    # backward sweep: suffix radiance at each vertex (reverse scan)
    def back_body(l_next, vert):
        l_here = vert["l"] + vert["w"] * l_next
        return l_here, l_here

    _, l_heres = jax.lax.scan(
        back_body, l_tail, {"l": verts["l"], "w": verts["w"]}, reverse=True
    )

    first_l = l_heres[0]  # suffix radiance at the FIRST path vertex
    stacked = {"x": verts["x"], "n": verts["n"], "l": l_heres,
               "alive": verts["alive"]}
    return first_l, probe_vz, probe_n, stacked


def _rev_flat(a):
    """Flatten stacked (depth, n_px, ...) vertex records in the original
    last-vertex-first scatter order."""
    depth, n_px = a.shape[0], a.shape[1]
    return jnp.flip(a, axis=0).reshape((depth * n_px,) + a.shape[2:])


def sharc_update_pass(ctx: traversal.TraceContext, scene: Scene, cam: Camera,
                      cfg: RenderConfig, settings: Settings, frame,
                      state: sharc.SharcState,
                      probe_axis: str | None = None) -> sharc.SharcState:
    """Trace the low-res update paths and scatter radiance into the cache.

    With cfg.use_confidence, ALSO re-traces the PREVIOUS frame's probe paths
    (prev camera matrices + prev-frame RNG streams) under current lighting —
    probes["prev_retrace_lum"/"prev_retrace_vz"] feed the history-confidence
    gradient |L_prev_retraced - L_prev_stored| (SharcUpdate.cs.hlsl:222-250),
    which isolates lighting change from sampling noise (the same path is
    replayed, so the Monte-Carlo noise cancels exactly on static scenes).

    probe_axis: mesh axis name when called inside shard_map — each device
    traces 1/n of the probe grid and the results are all_gathered back to the
    full grid (bit-identical to the unsharded pass: per-probe RNG is keyed by
    probe id, and the gather restores canonical order before the scatter), so
    the table/probe planes stay replicated while the TRACE work — the
    expensive part — shards with the pixels. Without this the probe pass was
    replicated-compute on every device (round-2 review weak #9)."""
    import dataclasses as dc

    ds = cfg.sharc_downscale
    sw, sh = max(cfg.width // ds, 1), max(cfg.height // ds, 1)
    n_px = sw * sh

    if probe_axis is not None:
        n_dev = jax.lax.axis_size(probe_axis)
        n_loc = -(-n_px // n_dev)
        lo = jax.lax.axis_index(probe_axis) * n_loc
        sidx = lo + jnp.arange(n_loc, dtype=jnp.int32)
        valid = sidx < n_px
        sidx = jnp.minimum(sidx, n_px - 1)

        def gather_full(a, axis):
            full = jax.lax.all_gather(a, probe_axis, axis=axis, tiled=True)
            # local slices are contiguous ascending probe ids; pad entries
            # (clamped duplicates) land past n_px and are cut here
            return jax.lax.slice_in_dim(full, 0, n_px, axis=axis)
    else:
        sidx = None
        valid = None

        def gather_full(a, axis):
            return a

    def trace_full(cam_t, frame_t):
        first_l, probe_vz, probe_n, stacked = _trace_probe_paths(
            ctx, scene, cam_t, cfg, settings, frame_t, sidx=sidx
        )
        if valid is not None:
            stacked = dict(stacked, alive=stacked["alive"] & valid[None, :])
        first_l = gather_full(first_l, 0)
        probe_vz = gather_full(probe_vz, 0)
        probe_n = gather_full(probe_n, 0)
        stacked = {k: gather_full(v, 1) for k, v in stacked.items()}
        return first_l, probe_vz, probe_n, stacked

    first_l, probe_vz, probe_n, stacked = trace_full(cam, frame)
    xs, ns = _rev_flat(stacked["x"]), _rev_flat(stacked["n"])
    ls, ms = _rev_flat(stacked["l"]), _rev_flat(stacked["alive"])
    # LOD transition dithering on the WRITE side too, so both rings near a
    # level boundary stay populated for the dithered queries
    lod_dither = rng.uniform1(jnp.arange(xs.shape[0], dtype=jnp.int32), frame, 800_077)
    state = sharc.update(state, xs, ns, ls, cam.position, frame, mask=ms,
                         dither=lod_dither)

    # probe "small G-buffer" for the history-confidence gradient
    # (SharcUpdate.cs.hlsl:104-107 luminance+normal+viewZ store; the gradient
    # consumer is denoise/confidence.py): first-vertex suffix radiance +
    # primary viewZ/normal at probe resolution
    probes = {
        "radiance": first_l.reshape(sh, sw, 3),
        "view_z": probe_vz.reshape(sh, sw),
        "normal": probe_n.reshape(sh, sw, 3),
    }
    if cfg.use_confidence:
        prev_cam = dc.replace(
            cam, view_to_world=cam.view_to_world_prev, jitter=cam.jitter_prev
        )
        prev_l, prev_vz, _, _ = trace_full(prev_cam, frame - 1)
        from nrdsample_tpu.mathlib import color

        probes["prev_retrace_lum"] = color.luminance(prev_l).reshape(sh, sw)
        probes["prev_retrace_vz"] = prev_vz.reshape(sh, sw)
    return sharc.resolve(state, frame), probes
