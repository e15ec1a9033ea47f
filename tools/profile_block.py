"""TPU experiment: packet width (BLOCK_RAYS) x hoist on the resident kernel.

Hypothesis: per-packet fixed overhead (~8 us: two while loops, ray loads,
output writes) dominates at block=128 now that worklists are p50~1 after
morton binning — wider packets amortize it 2-8x while per-trip VPU math is
still below the ~1.5 us loop latency. Run by absolute path on the axon TPU.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
cs = ctx.clusters
print('clusters', cs.count, flush=True)

W = H = 512
cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0, aspect=1.0)
pix = jnp.arange(W*H, dtype=jnp.int32)
o, d, _ = cam_mod.camera_rays(cam, W, H, pix, jnp.int32(0))
o = jax.block_until_ready(o); R = W*H

rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(R), jnp.int32)
oj, dj = o[perm], d[perm]

def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    n = 8
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.2f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
    return out

ref = None
for block in [128, 256, 512, 1024]:
    for hoist in [False, True]:
        tag = f'b{block}' + ('+hoist' if hoist else '')
        fn = jax.jit(lambda o, d, block=block, hoist=hoist:
                     packet.closest_hit_packet(cs, o, d, block=block, hoist=hoist))
        out = bench(f'primary {tag}', fn, o, d)
        if ref is None:
            ref = out
        else:
            ok_t = bool(jnp.allclose(out['t'], ref['t'], atol=1e-3))
            frac = float(jnp.mean((out['tri'] == ref['tri']).astype(jnp.float32)))
            print(f'  parity: t {ok_t} tri {frac:.4f}', flush=True)

for block in [128, 256, 512, 1024]:
    tag = f'b{block}+hoist'
    fn = jax.jit(lambda o, d, block=block:
                 packet.closest_hit_packet(cs, o, d, block=block, hoist=True, sort=True))
    bench(f'sorted-jumbled {tag}', fn, oj, dj)
