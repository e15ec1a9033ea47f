"""Narrow the post-finish gather poisoning: which program is slow afterwards,
and can it be restored?"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import gc, time, jax, jax.numpy as jnp
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

plane, pos = dn_plan(rh, mv)
jax.block_until_ready(plane)
pre0 = dn_gather(plane, pos)
jax.block_until_ready(pre0)


def loop(name, fn, n=10):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)
    return out


loop("pre: gather fixed", lambda: dn_gather(plane, pos))
out, h2 = dn_finish(rh, img, vz, nrm, mv, pre0)
jax.block_until_ready(out)
print("finish ran once", flush=True)

loop("post: gather fixed", lambda: dn_gather(plane, pos))
loop("post: plan", lambda: dn_plan(rh, mv))

del out, h2
gc.collect()
loop("post-del: gather fixed", lambda: dn_gather(plane, pos))

dn_gather2 = jax.jit(lambda plane, pos: filtering.sample_bilinear_block(plane, pos) + 0.0)
loop("post: fresh-jit gather+0", lambda: dn_gather2(plane, pos))

# does a mono denoise run ALSO poison-or-restore?
dn_mono = jax.jit(lambda hist, img, vz, nrm, mv: relax.denoise(hist, img, vz, nrm, mv))
o2, _ = dn_mono(rh, img, vz, nrm, mv)
jax.block_until_ready(o2)
loop("post-mono: gather fixed", lambda: dn_gather(plane, pos))
loop("mono cycle check", lambda: dn_mono(rh, img, vz, nrm, mv))
