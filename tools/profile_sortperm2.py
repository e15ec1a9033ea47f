"""TPU probe: real morton-sort machinery breakdown on real bounce rays."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
cs = ctx.clusters
R = 512 * 512
rs = np.random.RandomState(0)
ob = jnp.asarray(rs.rand(R, 3).astype(np.float32) * 8 - 4)
db = rs.randn(R, 3).astype(np.float32); db /= np.linalg.norm(db, axis=-1, keepdims=True)
db = jnp.asarray(db)

def bench(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.3f} ms', flush=True)
    return out

key = bench('morton keys', jax.jit(lambda o, d: packet._morton_sort_keys(o, d, cs)), ob, db)
perm = bench('argsort(key)', jax.jit(jnp.argsort), key)

def gather_packed(o, d, perm):
    tmb = jnp.ones((R,), jnp.float32)
    return jnp.concatenate([o, d, tmb[:, None]], axis=1)[perm]
packed = bench('concat+gather[perm]', jax.jit(gather_packed), ob, db, perm)
inv = bench('argsort(perm)', jax.jit(jnp.argsort), perm)

def full(o, d):
    key = packet._morton_sort_keys(o, d, cs)
    perm = jnp.argsort(key)
    tmb = jnp.ones((R,), jnp.float32)
    packed = jnp.concatenate([o, d, tmb[:, None]], axis=1)[perm]
    inv = jnp.argsort(perm)
    out = jnp.stack([packed[:, 0], packed[:, 1], packed[:, 2]], axis=1)[inv]
    return out
bench('full machinery fused', jax.jit(full), ob, db)

def variadic(o, d):
    key = packet._morton_sort_keys(o, d, cs)
    idx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).squeeze(-1)
    tmb = jnp.ones((R,), jnp.float32)
    outs = jax.lax.sort((key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2], tmb, idx), num_keys=1)
    return outs[1:]
bench('variadic lax.sort (key + 8 payloads)', jax.jit(variadic), ob, db)

def variadic_packed(o, d):
    key = packet._morton_sort_keys(o, d, cs)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (R, 1), 0).squeeze(-1)
    word = (key & jnp.uint32(0xFFFC0000)) | idx
    sw = jnp.sort(word)
    perm = (sw & jnp.uint32(0x3FFFF)).astype(jnp.int32)
    tmb = jnp.ones((R,), jnp.float32)
    packed = jnp.concatenate([o, d, tmb[:, None]], axis=1)[perm]
    return packed, perm
bench('packedword sort + wide gather', jax.jit(variadic_packed), ob, db)

def scatter_unperm(res4, perm):
    return jnp.zeros_like(res4).at[perm].set(res4)
res4 = jnp.asarray(rs.rand(R, 4).astype(np.float32))
p = jnp.argsort(key)
bench('unpermute scatter (R,4)', jax.jit(scatter_unperm), res4, p)
bench('unpermute gather[inv] (R,4)', jax.jit(lambda r, i: r[i]), res4, p)
