"""Probe: does dn_finish trigger the 540ms staged cliff, and is history
cycling required?"""
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
dn_gather = jax.jit(lambda plane, pos: filtering.sample_bilinear_block(plane, pos))
dn_finish = jax.jit(
    lambda hist, img, vz, nrm, mv, pre: relax.denoise(hist, img, vz, nrm, mv, pre=pre)
)


def loop(name, fn, n=10):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)
    return out


def full_fixed():
    plane, pos = dn_plan(rh, mv)
    pre = dn_gather(plane, pos)
    return dn_finish(rh, img, vz, nrm, mv, pre)


loop("a plan->gather (no finish compiled yet)", lambda: dn_gather(*dn_plan(rh, mv)))
loop("b full staged FIXED hist", full_fixed)
loop("c plan->gather again", lambda: dn_gather(*dn_plan(rh, mv)))

state = {"h": rh}


def full_cycle():
    hist = state["h"]
    plane, pos = dn_plan(hist, mv)
    pre = dn_gather(plane, pos)
    out, h2 = dn_finish(hist, img, vz, nrm, mv, pre)
    state["h"] = h2
    return out


loop("d full staged CYCLING hist", full_cycle)
loop("e plan->gather after cycling", lambda: dn_gather(*dn_plan(rh, mv)))
loop("f full staged FIXED again", full_fixed)
