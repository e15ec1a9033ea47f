import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time; t0=time.time()
def p(m): print(f'{m} {time.time()-t0:.1f}s', flush=True)
import jax, jax.numpy as jnp, numpy as np
p('import'); print(jax.devices(), flush=True)
x = jnp.ones((256,256)); jax.block_until_ready(x @ x); p('first matmul')
# raw transfer speed
big = np.ones((1<<20,), np.float32)  # 4 MB
t1=time.time(); jax.block_until_ready(jnp.asarray(big)); print(f'4MB upload {time.time()-t1:.2f}s', flush=True)
t1=time.time()
for _ in range(20): jax.block_until_ready(jnp.asarray(np.ones((64,), np.float32)))
print(f'20 tiny uploads {time.time()-t1:.2f}s', flush=True)
from nrdsample_tpu.scene import procedural
t1=time.time(); scene = procedural.shader_balls(grid=3, sphere_res=24); p(f'scene (dt {time.time()-t1:.1f}s)')
from nrdsample_tpu.ops import traversal
t1=time.time(); ctx, scene = traversal.build_context(scene)
jax.block_until_ready(ctx.clusters.p0_b); p(f'ctx (dt {time.time()-t1:.1f}s)')
from nrdsample_tpu.ops import packet
print('clusters', ctx.clusters.count, flush=True)
R = 1<<15
rs = np.random.RandomState(0)
o = jnp.asarray(np.tile(np.array([[0,-9,4.5]],np.float32),(R,1)) + rs.randn(R,3).astype(np.float32)*0.01)
t = (rs.rand(R,3).astype(np.float32)-0.5)*np.array([12,12,4],np.float32)+np.array([0,0,1],np.float32)
d = jnp.asarray(t)-o; d = d/jnp.linalg.norm(d,axis=-1,keepdims=True)
p('rays')
fn = jax.jit(lambda o,d: packet.closest_hit_packet(ctx.clusters, o, d, block=512))
res = jax.block_until_ready(fn(o,d)); p('packet compile+run')
t1=time.time()
for _ in range(5): res = fn(o,d)
jax.block_until_ready(res); dt=(time.time()-t1)/5
print(f'packet: {dt*1e3:.2f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
print('hit frac', float((res['tri']>=0).mean()), flush=True)
from nrdsample_tpu.ops import cluster as cl
fx = jax.jit(lambda o,d: cl.closest_hit_clustered(ctx.clusters, ctx.tris, o, d))
rx = jax.block_until_ready(fx(o,d)); p('xla cluster compile+run')
t1=time.time()
for _ in range(5): rx = fx(o,d)
jax.block_until_ready(rx); dt=(time.time()-t1)/5
print(f'xla cluster: {dt*1e3:.2f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
hp = np.asarray(res['tri']); hx = np.asarray(rx['tri'])
print('tri agree', float((hp==hx).mean()), flush=True)
