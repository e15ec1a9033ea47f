"""Bisect which sub-program flips the device into slow-gather mode."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, dataclasses, jax, jax.numpy as jnp
from nrdsample_tpu.denoise import relax, common
from nrdsample_tpu.mathlib import filtering

h = w = 512
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (h, w, 3), jnp.float32)
vz = jnp.ones((h, w), jnp.float32)
nrm = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
mv = jnp.zeros((h, w, 3), jnp.float32)
rh = relax.RelaxHistory.create(h, w, jnp.float32)

dn_plan = jax.jit(lambda hist, mv: relax.taccum_requests(hist, mv[..., :2]))
dn_gather = jax.jit(lambda plane, pos: filtering.sample_bilinear_block(plane, pos))
plane, pos = dn_plan(rh, mv)
jax.block_until_ready(plane)
pre0 = dn_gather(plane, pos)
jax.block_until_ready(pre0)


def gtime(n=5):
    out = dn_gather(plane, pos)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = dn_gather(plane, pos)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


print(f"baseline gather: {gtime():.2f} ms", flush=True)

s = relax.RelaxSettings()

# candidate 1: anti-firefly
f1 = jax.jit(lambda x: common.anti_firefly(x))
jax.block_until_ready(f1(img))
print(f"after anti_firefly: {gtime():.2f} ms", flush=True)

# candidate 2: temporal_accumulate with pre
f2 = jax.jit(lambda hist, i, v, n, m, p: relax.temporal_accumulate(
    hist, i, v, n, m, s, False, None, pre=p))
out = f2(rh, img, vz, nrm, mv, pre0)
jax.block_until_ready(jax.tree.leaves(out)[0])
print(f"after temporal_accumulate: {gtime():.2f} ms", flush=True)

# candidate 3: one atrous iteration
var = jnp.ones((h, w), jnp.float32)
f3 = jax.jit(lambda o, v: relax.atrous_iteration(o, v, vz, nrm, 1, s))
out = f3(img, var)
jax.block_until_ready(out[0])
print(f"after atrous step1: {gtime():.2f} ms", flush=True)

# candidate 4: all 5 atrous iterations
def allat(o, v):
    for i in range(s.atrous_iterations):
        o, v = relax.atrous_iteration(o, v, vz, nrm, 1 << i, s)
    return o, v
f4 = jax.jit(allat)
out = f4(img, var)
jax.block_until_ready(out[0])
print(f"after atrous x5: {gtime():.2f} ms", flush=True)

# candidate 5: estimate_variance
f5 = jax.jit(lambda a, m, fr: relax.estimate_variance(a, m, fr))
out = f5(img, jnp.ones((h, w, 2)), jnp.ones((h, w)))
jax.block_until_ready(out)
print(f"after estimate_variance: {gtime():.2f} ms", flush=True)
