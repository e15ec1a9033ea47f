import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, cluster as cl
from nrdsample_tpu.ops import intersect

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
print('mode', ctx.mode, 'tris', ctx.tris.count, 'clusters', ctx.clusters.count, flush=True)

R = 1 << 18
rs = np.random.RandomState(0)
o = jnp.asarray((rs.rand(R,3).astype(np.float32)-0.5)*15 + [0,0,3])
d = jnp.asarray(rs.randn(R,3).astype(np.float32))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
tm = jnp.full((R,), 1e5, jnp.float32)

def bench(name, fn, *args):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/3
    print(f'{name}: {dt*1e3:.1f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
    return out

# stage 1 alone
bench('stage1 entry', lambda o,d,tm: cl._cluster_entry(o,d,ctx.clusters,tm), o,d,tm)
# argsort alone
entry = jax.jit(lambda o,d,tm: cl._cluster_entry(o,d,ctx.clusters,tm))(o,d,tm)
bench('argsort', lambda e: jnp.argsort(e, axis=1), entry)
# full closest hit
res = bench('closest_hit cluster', lambda o,d,tm: cl.closest_hit_clustered(ctx.clusters, ctx.tris, o, d, tm), o,d,tm)
print('hit frac', float((res['tri']>=0).mean()), flush=True)
# iteration count estimate: n_hit stats
nh = (entry < 1e5).sum(axis=1)
print('n_hit mean/p95/max', float(nh.mean()), int(jnp.percentile(nh,95)), int(nh.max()), flush=True)
# dense for reference
bench("dense brute", lambda o,d: intersect.intersect_dense(o,d,ctx.tris.p0,ctx.tris.e1,ctx.tris.e2, tile=512), o,d)
