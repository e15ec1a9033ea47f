"""Per-stage timing of the staged RELAX denoise while cycling history."""
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

dn_plan = jax.jit(lambda hist, mv: relax.taccum_requests(hist, mv[..., :2]))
dn_gather = jax.jit(filtering.sample_bilinear_block)
dn_finish = jax.jit(
    lambda hist, img, vz, nrm, mv, pre: relax.denoise(hist, img, vz, nrm, mv, pre=pre)
)


def staged(hist):
    ts = [time.perf_counter()]
    plane, pos = dn_plan(hist, mv)
    jax.block_until_ready(plane)
    ts.append(time.perf_counter())
    pre = dn_gather(plane, pos)
    jax.block_until_ready(pre)
    ts.append(time.perf_counter())
    out, h2 = dn_finish(hist, img, vz, nrm, mv, pre)
    jax.block_until_ready(out)
    ts.append(time.perf_counter())
    return out, h2, [1e3 * (b - a) for a, b in zip(ts, ts[1:])]


print("warmup start", flush=True)
t0 = time.perf_counter()
out, rh2, _ = staged(rh)
print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)
for i in range(6):
    out, rh2, stages = staged(rh2)
    print(i, [f"{s:.2f}" for s in stages], flush=True)
