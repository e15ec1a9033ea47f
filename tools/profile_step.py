import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, cluster as cl, intersect

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
cs = ctx.clusters
R = 1 << 18
rs = np.random.RandomState(0)
o = jnp.asarray((rs.rand(R,3).astype(np.float32)-0.5)*15 + [0,0,3])
d = jnp.asarray(rs.randn(R,3).astype(np.float32)); d = d/jnp.linalg.norm(d,axis=-1,keepdims=True)
cid = jnp.asarray(rs.randint(0, cs.count, R).astype(np.int32))

def bench(name, fn, *args):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(5): out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f'{name}: {(time.perf_counter()-t0)/5*1e3:.2f} ms', flush=True)
    return out

# gather alone
bench('gather p0_b[cid]', lambda cid: (cs.p0_b[cid], cs.e1_b[cid], cs.e2_b[cid]), cid)
# one-hot matmul gather
tbl = jnp.concatenate([cs.p0_b.reshape(cs.count,-1), cs.e1_b.reshape(cs.count,-1), cs.e2_b.reshape(cs.count,-1)], axis=1)
def onehot_gather(cid):
    oh = jax.nn.one_hot(cid, cs.count, dtype=jnp.float32)
    return oh @ tbl
bench('onehot matmul gather', onehot_gather, cid)
# full MT test with pre-gathered blocks
tp0, te1, te2 = jax.jit(lambda c: (cs.p0_b[c], cs.e1_b[c], cs.e2_b[c]))(cid)
bench('mt test on gathered', lambda o,d,a,b,c2: intersect._mt_intersect(o[:,None,:], d[:,None,:], a,b,c2)[0], o,d,tp0,te1,te2)
# one full step equivalent
def one_step(o, d, cid):
    tp0, te1, te2 = cs.p0_b[cid], cs.e1_b[cid], cs.e2_b[cid]
    t,u,v,h = intersect._mt_intersect(o[:,None,:], d[:,None,:], tp0, te1, te2)
    t = jnp.where(h, t, 1e5)
    a = jnp.argmin(t, axis=-1)
    return jnp.take_along_axis(t, a[:,None], -1)[:,0]
bench('one full step', one_step, o, d, cid)
