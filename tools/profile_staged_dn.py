"""TPU probe: where do the 541 ms/iter of the STAGED denoise bench go?

Times each staged program (plan/gather/finish) separately, the staged
composition, and the monolithic relax.denoise jit, at 512^2.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import relax
from nrdsample_tpu.mathlib import filtering

h = w = 512
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (h, w, 3), jnp.float32)
vz = jnp.ones((h, w), jnp.float32)
nrm = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
mv = jnp.zeros((h, w, 3), jnp.float32)
rh = relax.RelaxHistory.create(h, w, jnp.float32)


def bench(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)
    return out


@jax.jit
def dn_plan(hist, mv):
    return relax.taccum_requests(hist, mv[..., :2])


@jax.jit
def dn_gather(plane, pos):
    return filtering.sample_bilinear_block(plane, pos)


@jax.jit
def dn_finish(hist, img, vz, nrm, mv, pre):
    return relax.denoise(hist, img, vz, nrm, mv, pre=pre)


@jax.jit
def dn_mono(hist, img, vz, nrm, mv):
    return relax.denoise(hist, img, vz, nrm, mv)


# individual stages, FIXED history (no cycling)
plane, pos = bench("plan", dn_plan, rh, mv)
pre = bench("gather", dn_gather, plane, pos)
out = bench("finish", dn_finish, rh, img, vz, nrm, mv, pre)

# staged composed, cycling history
def staged(hist):
    plane, pos = dn_plan(hist, mv)
    pre = dn_gather(plane, pos)
    return dn_finish(hist, img, vz, nrm, mv, pre)

out, rh2 = staged(rh)
out, rh2 = staged(rh2)
jax.block_until_ready(out)
t0 = time.perf_counter()
n = 10
for _ in range(n):
    out, rh2 = staged(rh2)
jax.block_until_ready(out)
print(f"staged cycle: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

# monolithic, cycling history
out, rh3 = dn_mono(rh, img, vz, nrm, mv)
out, rh3 = dn_mono(rh3, img, vz, nrm, mv)
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(n):
    out, rh3 = dn_mono(rh3, img, vz, nrm, mv)
jax.block_until_ready(out)
print(f"mono cycle: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)
