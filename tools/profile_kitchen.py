"""TPU probe: where do kitchen1080's ~2.3 s/frame go?

Times the full frame, then trace_frame alone, then the building blocks:
primary launch, IS-batched bounce generation, SHARC update pass, and the
image phase (RELAX x2 + SIGMA + confidence + TAA at 1080p).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.config import Denoiser, NrdMode, RenderConfig, Settings, TracingMode
from nrdsample_tpu.pipeline import frame as frame_mod


def bench(name, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f'{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms', flush=True)
    return out


def main():
    scene = procedural.kitchen()
    ctx, scene = traversal.build_context(scene)
    cfg = RenderConfig(width=1920, height=1080, rpp=1, bounce_num=1,
                       tracing_mode=TracingMode.FULL_PROBABILISTIC,
                       denoiser=Denoiser.RELAX, nrd_mode=NrdMode.SH,
                       use_taa=True, use_sharc=True, use_confidence=True)
    cam = look_at(eye=[0.0, -1.6, 1.6], target=[0.0, 1.5, 1.2], fov_y_deg=65.0,
                  aspect=cfg.width / cfg.height)
    settings = Settings(sun_elevation=jnp.float32(35.0))
    hist = frame_mod.History.create(cfg)

    full = jax.jit(lambda s, c, st, h: frame_mod.render_frame(ctx, s, c, cfg, st, h))
    out, hist = bench('full frame', full, scene, cam, settings, hist)

    tf = jax.jit(lambda s, c, st, h: frame_mod.trace_frame(ctx, s, c, cfg, st, h))
    gb, aux = bench('trace_frame', tf, scene, cam, settings, hist)

    imgf = jax.jit(lambda st, c, h, gb, aux: frame_mod.image_frame(
        cfg, st, c, h, gb, aux))
    bench('image_frame', imgf, settings, cam, hist, gb, aux)

    # no-IS variant: is the 16-candidate reservoir the sink?
    import dataclasses as dc
    cfg_nois = dc.replace(cfg, use_importance_sampling=False)
    tf2 = jax.jit(lambda s, c, st, h: frame_mod.trace_frame(ctx, s, c, cfg_nois, st, h))
    bench('trace_frame no-IS', tf2, scene, cam, settings, hist)

    cfg_nosharc = dc.replace(cfg, use_sharc=False, use_confidence=False)
    tf3 = jax.jit(lambda s, c, st, h: frame_mod.trace_frame(ctx, s, c, cfg_nosharc, st, h))
    h3 = frame_mod.History.create(cfg_nosharc)
    bench('trace_frame no-SHARC/conf', tf3, scene, cam, settings, h3)


if __name__ == '__main__':
    main()
