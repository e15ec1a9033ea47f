"""TPU probe: end-to-end frame budget decomposition by differential config.

Times the headline shaderballs512 frame with features toggled to attribute
frame time: bounces 0/1/2, shadows on/off, denoiser on/off.
Run by absolute path on the axon TPU.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0, aspect=1.0)

def run(tag, **kw):
    skw = dict(sun_elevation=jnp.float32(45.0))
    if kw.pop('no_shadows', False):
        skw['disable_shadows'] = jnp.int32(1)
    cfg = RenderConfig(width=512, height=512,
                       tracing_mode=TracingMode.FULL_PROBABILISTIC,
                       **kw)
    settings = Settings(**skw)
    history = frame_mod.History.create(cfg)
    frame_fn = frame_mod.make_jitted_frame(ctx, cfg)
    def step(history):
        out, new_h = frame_fn(scene, cam, settings, history)
        return out["color"], new_h
    color, history = step(history)
    jax.block_until_ready(color)
    t0 = time.perf_counter()
    for _ in range(6):
        color, history = step(history)
    jax.block_until_ready(color)
    dt = (time.perf_counter() - t0) / 6
    print(f'{tag}: {dt*1e3:.1f} ms', flush=True)

run('full (rpp1 b2 REFERENCE)', rpp=1, bounce_num=2, denoiser=Denoiser.REFERENCE)
run('bounce1', rpp=1, bounce_num=1, denoiser=Denoiser.REFERENCE)
run('bounce0', rpp=1, bounce_num=0, denoiser=Denoiser.REFERENCE)
run('bounce0 no-shadows', rpp=1, bounce_num=0, denoiser=Denoiser.REFERENCE, no_shadows=True)
run('bounce2 no-shadows', rpp=1, bounce_num=2, denoiser=Denoiser.REFERENCE, no_shadows=True)
run('bounce2 RELAX', rpp=1, bounce_num=2, denoiser=Denoiser.RELAX)
run('bounce2 REBLUR', rpp=1, bounce_num=2, denoiser=Denoiser.REBLUR)
