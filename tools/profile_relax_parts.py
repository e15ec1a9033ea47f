"""TPU probe: RELAX stack component costs at 512² (post-scan refactor)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.denoise import relax, common

H = W = 512
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H, W, 3), jnp.float32)
vz = jnp.ones((H, W), jnp.float32)
nrm = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(1.0)
mv = jnp.zeros((H, W, 3), jnp.float32)
hist = relax.RelaxHistory.create(H, W, jnp.float32)
s = relax.RelaxSettings()

def bench(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.3f} ms', flush=True)
    return out

bench('anti_firefly', jax.jit(common.anti_firefly), img)
bench('taccum (4-tap gather)', jax.jit(
    lambda h, i, z, n2, m: relax.temporal_accumulate(h, i, z, n2, m, s)),
    hist, img, vz, nrm, mv)
acc, moments, frames, _ = relax.temporal_accumulate(hist, img, vz, nrm, mv, s)
bench('estimate_variance', jax.jit(relax.estimate_variance), acc, moments, frames)
var = relax.estimate_variance(acc, moments, frames)

def atrous5(out, var):
    steps = jnp.array([1, 2, 4, 8, 16], jnp.int32)
    def body(c, step):
        o, v = c
        o2, v2 = relax.atrous_iteration(o, v, vz, nrm, step, s, max_step=16)
        return (o2, v2), None
    (o, v), _ = jax.lax.scan(body, (out, var), steps)
    return o
bench('atrous x5 (scan + dyn slice)', jax.jit(atrous5), acc, var)

def atrous5_unrolled(out, var):
    for i in range(5):
        out, var = relax.atrous_iteration(out, var, vz, nrm, 1 << i, s)
    return out
bench('atrous x5 (unrolled static)', jax.jit(atrous5_unrolled), acc, var)

bench('full relax.denoise', jax.jit(
    lambda h, i, z, n2, m: relax.denoise(h, i, z, n2, m, s)),
    hist, img, vz, nrm, mv)
