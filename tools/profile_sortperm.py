"""TPU probe: cheaper morton re-binning machinery.

Current: u32 keys -> argsort (pair sort) -> packed gather -> inverse argsort
-> output gather. Candidates: single-word packed sort (key|idx in 32 bits),
scatter-based inverse, output scatter instead of inverse+gather.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np

R = 512 * 512  # 2^18
rs = np.random.RandomState(0)
key = jnp.asarray(rs.randint(0, 1 << 32, R, dtype=np.uint64).astype(np.uint32))
vals = jnp.asarray(rs.rand(R, 8).astype(np.float32))

def bench(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.3f} ms', flush=True)
    return out

# current scheme
def cur(key, vals):
    perm = jnp.argsort(key)
    packed = vals[perm]
    inv = jnp.argsort(perm)
    return packed, inv
bench('argsort + gather + argsort(inv)', jax.jit(cur), key, vals)

bench('argsort alone', jax.jit(lambda k: jnp.argsort(k)), key)
bench('sort alone (u32)', jax.jit(lambda k: jnp.sort(k)), key)

# packed single-word: top 14 bits of key | 18-bit idx
def packed_sort(key, vals):
    idx = jax.lax.broadcasted_iota(jnp.uint32, (R, 1), 0).squeeze(-1)
    word = (key & jnp.uint32(0xFFFC0000)) | idx
    sw = jnp.sort(word)
    perm = (sw & jnp.uint32(0x3FFFF)).astype(jnp.int32)
    packed = vals[perm]
    inv = jnp.zeros((R,), jnp.int32).at[perm].set(
        jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).squeeze(-1))
    return packed, inv
bench('packed-word sort + gather + scatter-inv', jax.jit(packed_sort), key, vals)

def packed_sort2(key, vals):
    idx = jax.lax.broadcasted_iota(jnp.uint32, (R, 1), 0).squeeze(-1)
    word = (key & jnp.uint32(0xFFFC0000)) | idx
    sw = jnp.sort(word)
    perm = (sw & jnp.uint32(0x3FFFF)).astype(jnp.int32)
    packed = vals[perm]
    inv = jnp.argsort(perm)
    return packed, inv
bench('packed-word sort + gather + argsort-inv', jax.jit(packed_sort2), key, vals)

# result un-permute: gather-by-inv vs scatter-by-perm
res = jnp.asarray(rs.rand(R, 4).astype(np.float32))
perm = jnp.argsort(key)
inv = jnp.argsort(perm)
bench('unpermute via gather[inv]', jax.jit(lambda r, i: r[i]), res, inv)
bench('unpermute via scatter.at[perm]', jax.jit(
    lambda r, p: jnp.zeros_like(r).at[p].set(r)), res, perm)
