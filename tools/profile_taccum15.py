"""TPU: isolate the history gather behind a lax.map control-flow boundary.

Finding so far: the footprint gather is 0.06 ms standalone (t1-t3 of
profile_taccum14) but 570 ms inside the full temporal_accumulate — XLA's
gather emitter choice depends on downstream consumer structure (two blend
consumers -> scalar while-loop emitter, ~1.9us x 262k iters). Fusion does not
cross while-loop bodies, so wrapping JUST the gather in a multi-chunk lax.map
should pin the fast emitter regardless of context.

  t4  full taccum (control; expect ~570 ms)
  i2  taccum with reproject isolated in a 2-chunk lax.map
  i4  same, 4 chunks
  i1  same, 1 chunk (checks whether trip-count-1 gets inlined and re-poisoned)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import common, relax
from nrdsample_tpu.mathlib import filtering

H = W = 512
s = relax.RelaxSettings()


def isolated_bilinear(img, pos, chunks):
    h = pos.shape[0]
    pos_c = pos.reshape((chunks, h // chunks) + pos.shape[1:])
    out = jax.lax.map(lambda p: filtering.sample_bilinear(img, p), pos_c)
    return out.reshape((h,) + pos.shape[1:-1] + (img.shape[-1],))


def taccum_isolated(hi, il, vz, nrm, mv, chunks):
    mv_xy = mv[..., :2]
    packed = jnp.concatenate(
        [hi.illum, hi.moments, hi.view_z[..., None], hi.normal,
         hi.frames[..., None]], axis=-1)
    pos = common.pixel_positions(H, W) + mv_xy
    prev = isolated_bilinear(packed, pos, chunks)
    prev_illum, prev_moments = prev[..., 0:3], prev[..., 3:5]
    prev_z, prev_n, prev_frames = prev[..., 5], prev[..., 6:9], prev[..., 9]
    valid = common.disocclusion_weight(
        vz, mv[..., 2], prev_z, nrm, prev_n, s.disocclusion_threshold)
    valid = valid * common.in_screen(mv_xy, H, W).astype(vz.dtype)
    frames = jnp.minimum(prev_frames * valid + 1.0, s.max_accumulated_frames)
    alpha = 1.0 / frames
    lum = common.luminance(il)
    new_moments = jnp.stack([lum, lum * lum], axis=-1)
    acc_illum = prev_illum * (1 - alpha[..., None]) + il * alpha[..., None]
    acc_illum = jnp.where(valid[..., None] > 0, acc_illum, il)
    acc_moments = prev_moments * (1 - alpha[..., None]) + new_moments * alpha[..., None]
    acc_moments = jnp.where(valid[..., None] > 0, acc_moments, new_moments)
    return acc_illum, acc_moments, frames, relax.RelaxHistory(
        illum=acc_illum, moments=acc_moments, view_z=vz, normal=nrm,
        frames=frames)


def bench(name, fn, *args, n=6):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f'{name}: {min(ts)*1e3:.2f} ms', flush=True)


def main():
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (H, W, 3), jnp.float32)
    vz = jnp.ones((H, W), jnp.float32)
    nrm = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((H, W, 3), jnp.float32)
    hist = relax.RelaxHistory.create(H, W, jnp.float32)
    args = (hist, illum, vz, nrm, mv)
    bench('i2 isolated lax.map x2', functools.partial(taccum_isolated, chunks=2), *args)
    bench('i4 isolated lax.map x4', functools.partial(taccum_isolated, chunks=4), *args)
    bench('i1 isolated lax.map x1', functools.partial(taccum_isolated, chunks=1), *args)
    bench('t4 full taccum control', relax.temporal_accumulate, *args, s)


if __name__ == '__main__':
    main()
