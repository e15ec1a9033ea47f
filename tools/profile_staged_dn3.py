"""Decisive probe for the staged-gather 540ms mystery.

In ONE process:
  a) gather on FIXED plane/pos (same buffers every call)
  b) plan-only loop (fresh outputs, nothing consumes them)
  c) plan -> trivial sum consumer loop
  d) plan -> gather loop (the production staged shape)
  e) gather on fresh buffers produced by a TRIVIAL producer (copy of plane)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from nrdsample_tpu.denoise import relax
from nrdsample_tpu.mathlib import filtering

h = w = 512
mv = jnp.zeros((h, w, 3), jnp.float32)
rh = relax.RelaxHistory.create(h, w, jnp.float32)

dn_plan = jax.jit(lambda hist, mv: relax.taccum_requests(hist, mv[..., :2]))
dn_gather = jax.jit(lambda plane, pos: filtering.sample_bilinear_block(plane, pos))
dn_sum = jax.jit(lambda plane, pos: (jnp.sum(plane), jnp.sum(pos)))
dn_copy = jax.jit(lambda plane, pos: (plane + 0.0, pos + 0.0))

plane, pos = dn_plan(rh, mv)
jax.block_until_ready(plane)


def loop(name, fn, n=10):
    fn()
    jax.block_until_ready(jax.jit(lambda: jnp.zeros(()))())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)


loop("a gather(fixed)", lambda: dn_gather(plane, pos))
loop("b plan only", lambda: dn_plan(rh, mv))
loop("c plan->sum", lambda: dn_sum(*dn_plan(rh, mv)))
loop("d plan->gather", lambda: dn_gather(*dn_plan(rh, mv)))
loop("e copy->gather", lambda: dn_gather(*dn_copy(plane, pos)))
loop("a2 gather(fixed) again", lambda: dn_gather(plane, pos))
