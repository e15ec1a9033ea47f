"""Benchmark harness: rays/s on the flagship path-tracing pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the north-star target is >= 1 Grays/s
aggregate on a v5p-16, i.e. 62.5 Mrays/s per chip. vs_baseline is measured
single-chip rays/s divided by that per-chip target, so vs_baseline >= 1.0 means
the pod-level target is met at linear scaling.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_RAYS_PER_S_PER_CHIP = 62.5e6


def count_rays_per_pixel(cfg, scene=None) -> int:
    """Full-traversal rays cast per pixel per frame: primary + primary shadow +
    rpp * bounces * (bounce ray + shadow ray). Emissive-IS light probes test
    only the tiny emissive set, so they are not counted as traversal rays."""
    return 2 + cfg.rpp * cfg.bounce_num * 2


def main():
    import jax
    import jax.numpy as jnp

    from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
    from nrdsample_tpu.ops import traversal
    from nrdsample_tpu.pipeline import frame as frame_mod
    from nrdsample_tpu.scene import procedural
    from nrdsample_tpu.scene.types import look_at

    size = 512
    scene = procedural.shader_balls(grid=3, sphere_res=24)
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0)
    cfg = RenderConfig(
        width=size, height=size, rpp=1, bounce_num=2,
        tracing_mode=TracingMode.FULL_PROBABILISTIC, denoiser=Denoiser.REFERENCE,
    )
    settings = Settings(sun_elevation=jnp.float32(45.0))
    history = frame_mod.History.create(cfg)

    @jax.jit
    def step(history):
        out, new_h = frame_mod.render_frame(ctx, scene, cam, cfg, settings, history)
        return out["color"], new_h

    # warmup + compile
    color, history = step(history)
    jax.block_until_ready(color)

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        color, history = step(history)
    jax.block_until_ready(color)
    dt = (time.perf_counter() - t0) / n_iter

    # denoise-only throughput (BASELINE "Mpix/s per chip" metric): time the
    # RELAX stack on one signal at bench resolution
    from nrdsample_tpu.denoise import relax

    h = w = size
    rs_img = jnp.ones((h, w, 3), jnp.float32) * 0.5
    vz = jnp.ones((h, w), jnp.float32)
    nrm = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((h, w, 3), jnp.float32)
    rh = relax.RelaxHistory.create(h, w, jnp.float32)

    @jax.jit
    def dn(hist):
        out, new_h = relax.denoise(hist, rs_img, vz, nrm, mv)
        return out, new_h

    out_d, rh = dn(rh)
    jax.block_until_ready(out_d)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out_d, rh = dn(rh)
    jax.block_until_ready(out_d)
    dt_dn = (time.perf_counter() - t0) / n_iter
    denoise_mpix_s = cfg.n_pixels / dt_dn / 1e6

    rays_per_frame = cfg.n_pixels * count_rays_per_pixel(cfg)
    rays_per_s = rays_per_frame / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_second_per_chip",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S_PER_CHIP,
                "detail": {
                    "scene": "shader_balls",
                    "resolution": f"{size}x{size}",
                    "rpp": cfg.rpp,
                    "bounces": cfg.bounce_num,
                    "frame_ms": dt * 1e3,
                    "denoise_mpix_s": denoise_mpix_s,
                    "tris": int(scene.num_tris),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
