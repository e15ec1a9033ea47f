"""TPU micro-profile: gather formulations for history reprojection.

The denoiser temporal reprojection (4-tap bilinear over packed history
planes) measured 264 ms at 1080p — ~30 ns per gathered tap. This probes
which gather formulation XLA lowers best on TPU. Run by absolute path.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np


def bench(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f'{name}: {dt*1e3:.2f} ms', flush=True)
    return out


def main():
    h, w, c = 1080, 1920, 12
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (h, w, c), jnp.float32)
    # smooth-ish motion field: camera pan + swirl, fractional
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    px = xx + 7.3 + 4.0 * jnp.sin(yy * 0.01)
    py = yy - 3.1 + 2.0 * jnp.cos(xx * 0.013)
    ix = jnp.clip(px.astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(py.astype(jnp.int32), 0, h - 1)

    bench('2d adv-index (h,w,12)', jax.jit(lambda im, iy, ix: im[iy, ix]),
          img, iy, ix)

    flat = img.reshape(h * w, c)
    lin = iy * w + ix
    bench('flat take (hw,12)', jax.jit(
        lambda f, l: jnp.take(f, l.reshape(-1), axis=0).reshape(h, w, c)),
        flat, lin)

    bench('flat take bf16', jax.jit(
        lambda f, l: jnp.take(f, l.reshape(-1), axis=0).reshape(h, w, c)),
        flat.astype(jnp.bfloat16), lin)

    # one channel only — is cost per tap or per element?
    bench('flat take 1ch', jax.jit(
        lambda f, l: jnp.take(f, l.reshape(-1), axis=0).reshape(h, w)),
        flat[:, 0], lin)

    bench('flat take 4ch', jax.jit(
        lambda f, l: jnp.take(f, l.reshape(-1), axis=0).reshape(h, w, 4)),
        flat[:, :4], lin)

    # row-sorted indices (locality) — measures whether access order matters
    lin_sorted = jnp.sort(lin.reshape(-1))
    bench('flat take sorted idx', jax.jit(
        lambda f, l: jnp.take(f, l, axis=0)), flat, lin_sorted)

    # full bilinear, current formulation
    from nrdsample_tpu.mathlib import filtering
    from nrdsample_tpu.denoise import common, relax
    pos = jnp.stack([px, py], axis=-1)
    bench('sample_bilinear 12ch', jax.jit(filtering.sample_bilinear), img, pos)

    # reproject with mv computed inside jit (the production shape)
    mv_xy = jnp.stack([px - (xx + 0.5), py - (yy + 0.5)], axis=-1)
    bench('common.reproject 12ch', jax.jit(common.reproject), img, mv_xy)

    planes = [img[..., :3], img[..., 3:5], img[..., 5], img[..., 6:9],
              img[..., 9]]
    bench('reproject_many', jax.jit(
        lambda pl_, mv: common.reproject_many(pl_, mv)), planes, mv_xy)

    # temporal_accumulate sub-steps
    hist = relax.RelaxHistory.create(h, w, jnp.float32)
    s = relax.RelaxSettings()
    vz = jnp.ones((h, w), jnp.float32)
    nrm = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
    mv3 = jnp.concatenate([mv_xy, jnp.zeros((h, w, 1))], axis=-1)
    illum = img[..., :3]
    bench('temporal_accumulate', jax.jit(
        lambda hi, il, mv: relax.temporal_accumulate(hi, il, vz, nrm, mv, s)),
        hist, illum, mv3)

    bench('disocclusion_weight', jax.jit(
        lambda: common.disocclusion_weight(vz, mv3[..., 2], vz, nrm, nrm)))
    bench('in_screen', jax.jit(lambda: common.in_screen(mv_xy, h, w)))


if __name__ == '__main__':
    main()
