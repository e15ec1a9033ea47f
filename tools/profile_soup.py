import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod

import sys as _s; scene = procedural.random_soup(int(_s.argv[1]) if len(_s.argv)>1 else 100_000)
t0=time.time()
ctx, scene = traversal.build_context(scene)
print('ctx build', f'{time.time()-t0:.1f}s', 'clusters', ctx.clusters.count,
      'slab MB', packet.vmem_table_bytes(ctx.clusters)>>20, flush=True)
W = H = 512
cam = look_at(eye=[0.0, -60.0, 25.0], target=[0.0, 0.0, 5.0], fov_y_deg=55.0, aspect=1.0)
pix = jnp.arange(W*H, dtype=jnp.int32)
o, d, _ = cam_mod.camera_rays(cam, W, H, pix, jnp.int32(0))
R = W*H

wl = (packet._block_worklists if ctx.clusters.count <= 2048
      else packet._block_worklists_super)
order, keys, count = wl(o, d, ctx.clusters, jnp.full((R,),1e5,jnp.float32), 256)
c = np.asarray(count)
print(f'worklists b256: mean {c.mean():.1f} p50 {np.percentile(c,50):.0f} p95 {np.percentile(c,95):.0f} max {c.max()}', flush=True)

def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(5): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/5
    print(f'{name}: {dt*1e3:.2f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
    return out

fn = jax.jit(lambda o,d: packet.closest_hit_packet(ctx.clusters, o, d, block=256))
r = bench('soup primary b256', fn, o, d)
print('hit frac', float((r['tri']>=0).mean()), flush=True)
# bounce-like
rs = np.random.RandomState(0)
hit = np.asarray(r['tri'])>=0
x = np.asarray(o + r['t'][:,None]*d); x = np.where(hit[:,None], x, 0.0).astype(np.float32)
db = rs.randn(R,3).astype(np.float32); db /= np.linalg.norm(db,axis=-1,keepdims=True)
fn2 = jax.jit(lambda o,d: packet.closest_hit_packet(ctx.clusters, o, d, block=256, sort=True))
bench('soup bounce sorted b256', fn2, jnp.asarray(x+db*1e-3), jnp.asarray(db))
