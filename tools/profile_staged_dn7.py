"""Micro-bisect the slow-gather mode flip inside anti_firefly."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from nrdsample_tpu.denoise import relax, common
from nrdsample_tpu.mathlib import filtering

h = w = 512
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (h, w, 3), jnp.float32)
mv = jnp.zeros((h, w, 3), jnp.float32)
rh = relax.RelaxHistory.create(h, w, jnp.float32)

dn_plan = jax.jit(lambda hist, mv: relax.taccum_requests(hist, mv[..., :2]))
dn_gather = jax.jit(lambda plane, pos: filtering.sample_bilinear_block(plane, pos))
plane, pos = dn_plan(rh, mv)
jax.block_until_ready(plane)
jax.block_until_ready(dn_gather(plane, pos))


def gtime(n=5):
    out = dn_gather(plane, pos)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = dn_gather(plane, pos)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def check(name, fn, *args, compile_only=False):
    jfn = jax.jit(fn)
    if compile_only:
        jfn.lower(*args).compile()
    else:
        out = jfn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"after {name}: gather {gtime():.2f} ms", flush=True)


print(f"baseline: {gtime():.2f} ms", flush=True)

lum = jnp.sum(img, axis=-1)

check("luminance", lambda x: common.luminance(x), img)
check("pad-edge+slice (shifted)", lambda x: common.shifted(x, 1, 0), lum)
check("8-neighbor min/max", lambda x: jnp.minimum(common.shifted(x, 1, 0), common.shifted(x, 0, 1)), lum)
check("anti_firefly COMPILE only", lambda x: common.anti_firefly(x), img, compile_only=True)
check("anti_firefly EXEC", lambda x: common.anti_firefly(x), img)
