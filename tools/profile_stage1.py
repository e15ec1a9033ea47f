import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
cs = ctx.clusters
W = H = 512
cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0, aspect=1.0)
pix = jnp.arange(W*H, dtype=jnp.int32)
o, d, _ = cam_mod.camera_rays(cam, W, H, pix, jnp.int32(0))
R = W*H
tm = jnp.full((R,), 1e5, jnp.float32)

def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(10): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/10
    print(f'{name}: {dt*1e3:.2f} ms', flush=True)

s1 = jax.jit(lambda o,d,tm: packet._block_worklists(o, d, cs, tm, 256))
bench('stage1 worklists b256', s1, o, d, tm)
full = jax.jit(lambda o,d: packet.closest_hit_packet(cs, o, d, block=256))
bench('full closest_hit_packet b256', full, o, d)
srt = jax.jit(lambda o,d: packet.closest_hit_packet(cs, o, d, block=256, sort=True))
bench('full sorted', srt, o, d)
# sort cost alone
key = jax.jit(lambda o,d: packet._morton_sort_keys(o, d, cs))
bench('morton keys', key, o, d)
st = jax.jit(lambda o,d: jnp.argsort(packet._morton_sort_keys(o, d, cs)))
bench('morton keys+argsort', st, o, d)
