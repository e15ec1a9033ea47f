import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet, cluster as cl
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
print('rays ready', flush=True)

# worklist stats for primary rays
for blk in (128, 256, 512):
    order, keys, count = packet._block_worklists(o, d, cs, jnp.full((R,), 1e5, jnp.float32), blk)
    c = np.asarray(count)
    print(f'blk {blk}: worklist mean {c.mean():.1f} p50 {np.percentile(c,50):.0f} p95 {np.percentile(c,95):.0f} max {c.max()}', flush=True)

def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(5): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/5
    print(f'{name}: {dt*1e3:.2f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
    return out

for blk in (128, 256, 512):
    fn = jax.jit(lambda o,d,b=blk: packet.closest_hit_packet(cs, o, d, block=b))
    bench(f'packet primary b{blk}', fn, o, d)
fx = jax.jit(lambda o,d: cl.closest_hit_clustered(cs, ctx.tris, o, d))
rx = bench('xla-cluster primary', fx, o, d)

# bounce-like rays: random cosine hemisphere from primary hit points
rs = np.random.RandomState(0)
hit = np.asarray(rx['tri']) >= 0
x = np.asarray(o + rx['t'][:,None]*d)
x = np.where(hit[:,None], x, 0.0).astype(np.float32)
db = rs.randn(R,3).astype(np.float32); db /= np.linalg.norm(db,axis=-1,keepdims=True)
ob = jnp.asarray(x - np.sign((db*np.asarray(d)).sum(-1,keepdims=True))*0.0 + db*1e-3)
db = jnp.asarray(db)
fn = jax.jit(lambda o,d: packet.closest_hit_packet(cs, o, d, block=256))
bench('packet bounce-unsorted b256', fn, ob, db)
# octant+morton sort
oct_ = (np.asarray(db[:,0])>0).astype(np.int64)*4 + (np.asarray(db[:,1])>0).astype(np.int64)*2 + (np.asarray(db[:,2])>0).astype(np.int64)
q = ((x - x.min(0)) / max(1e-6, float((x.max(0)-x.min(0)).max())) * 1023).astype(np.int64)
def spread(a):
    a = (a | (a << 16)) & 0x030000FF; a = (a | (a << 8)) & 0x0300F00F
    a = (a | (a << 4)) & 0x030C30C3; a = (a | (a << 2)) & 0x09249249; return a
morton = spread(q[:,0]) | (spread(q[:,1])<<1) | (spread(q[:,2])<<2)
key = (oct_<<30) | (morton>>0)
perm = np.argsort(key)
obs, dbs = ob[perm], db[perm]
bench('packet bounce-sorted b256', fn, obs, dbs)
fx2 = jax.jit(lambda o,d: cl.closest_hit_clustered(cs, ctx.tris, o, d))
bench('xla-cluster bounce-unsorted', fx2, ob, db)
