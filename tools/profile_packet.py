import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet, cluster as cl

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
cs = ctx.clusters
print('clusters', cs.count, 'table KB', packet.vmem_table_bytes(cs)//1024, flush=True)

R = 1 << 18
rs = np.random.RandomState(0)
# coherent-ish rays: camera-like (perturbed common origin)
o = jnp.asarray(np.tile(np.array([[0,-9,4.5]],np.float32), (R,1)) + rs.randn(R,3).astype(np.float32)*0.01)
t = (rs.rand(R,3).astype(np.float32)-0.5)*np.array([12,12,4],np.float32)+np.array([0,0,1],np.float32)
d = jnp.asarray(t) - o; d = d/jnp.linalg.norm(d,axis=-1,keepdims=True)
# incoherent rays
oi = jnp.asarray((rs.rand(R,3).astype(np.float32)-0.5)*15 + [0,0,3])
di = jnp.asarray(rs.randn(R,3).astype(np.float32)); di = di/jnp.linalg.norm(di,axis=-1,keepdims=True)

def bench(name, fn, *args):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(5): out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/5
    print(f'{name}: {dt*1e3:.2f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
    return out

for blk in (256, 512, 1024):
    r1 = bench(f'packet coherent b{blk}', lambda o,d,b=blk: packet.closest_hit_packet(cs, o, d, block=b), o, d)
r2 = bench('packet incoherent b512', lambda o,d: packet.closest_hit_packet(cs, o, d, block=512), oi, di)
r3 = bench('xla-cluster coherent', lambda o,d: cl.closest_hit_clustered(cs, ctx.tris, o, d), o, d)
print('hit fracs', float((r1['tri']>=0).mean()), float((r2['tri']>=0).mean()), flush=True)
