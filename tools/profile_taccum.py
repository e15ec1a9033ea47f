"""TPU probe (round 4): RELAX taccum split at 1080p.

relax full signal = 17.5 ms at 1080p, the Pallas a-trous chain = 7.0 ms; this
isolates the remaining ~10 ms: the history gather (ops/reproject tiers), the
disocclusion+accumulate elementwise block, anti_firefly, estimate_variance.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.denoise import relax, common
from nrdsample_tpu.ops import reproject as repr_mod

H, W = 1080, 1920
rs = np.random.RandomState(0)
f32 = np.float32
img = jnp.asarray(rs.rand(H, W, 3).astype(f32))
vz = jnp.asarray((1 + rs.rand(H, W) * 5).astype(f32))
nrm = rs.randn(H, W, 3).astype(f32)
nrm = nrm * 0.3 + np.array([0, 0, 1.0], f32)
nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
nrm = jnp.asarray(nrm)
mv = jnp.asarray((rs.rand(H, W, 3) * 2 - 1).astype(f32) * 0.8)
hist = relax.RelaxHistory.create(H, W)
s = relax.RelaxSettings()


def bench(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f'{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms', flush=True)
    return out


bench('anti_firefly', jax.jit(common.anti_firefly), img)

packed, pos = relax.taccum_requests(hist, mv[..., :2])
packed = jax.block_until_ready(packed)
bench('gather 10ch (auto tiers)', jax.jit(repr_mod.sample_bilinear_auto), packed, pos)
bench('gather 10ch (d=4 direct)', jax.jit(
    lambda p, q: repr_mod.reproject_bounded(p, q, 4)), packed, pos)

pre = repr_mod.sample_bilinear_auto(packed, pos)
pre = jax.block_until_ready(pre)
bench('taccum given pre (elementwise)', jax.jit(
    lambda h, i, z, n2, m, pr: relax.temporal_accumulate(h, i, z, n2, m, s, pre=pr)),
    hist, img, vz, nrm, mv, pre)

bench('taccum full (pack+gather+elem)', jax.jit(
    lambda h, i, z, n2, m: relax.temporal_accumulate(h, i, z, n2, m, s)),
    hist, img, vz, nrm, mv)

acc, moments, frames, _ = relax.temporal_accumulate(hist, img, vz, nrm, mv, s)
acc = jax.block_until_ready(acc)
bench('estimate_variance', jax.jit(relax.estimate_variance), acc, moments, frames)

bench('relax.denoise full', jax.jit(
    lambda h, i, z, n2, m: relax.denoise(h, i, z, n2, m, s)), hist, img, vz, nrm, mv)
