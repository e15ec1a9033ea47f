"""TPU: does DUPLICATING the gather keep both on the fast path?

v2 (illum blend + frames + valid from one 10ch gather) = 0.10 ms; adding the
moments blends to the SAME gather's slices = 570 ms. Variants here feed the
moments blends from their OWN gather so each gather has a small consumer set:
  x1 v2-gather (10ch) + separate 2ch moments gather -> mu blends
  x2 v2-gather (10ch) + two separate 1-plane gathers -> mu blends
  x3 x1 but moments gather built from a (H,W,2) param slice (hist.moments)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import common, relax
from nrdsample_tpu.mathlib import filtering

H = W = 512
s = relax.RelaxSettings()


def core(hi, il, vz, nrm, mv):
    mv_xy = mv[..., :2]
    packed = jnp.concatenate(
        [hi.illum, hi.moments, hi.view_z[..., None], hi.normal,
         hi.frames[..., None]], axis=-1)
    pos = common.pixel_positions(H, W) + mv_xy
    prev = filtering.sample_bilinear(packed, pos)
    valid = common.disocclusion_weight(
        vz, mv[..., 2], prev[..., 5], nrm, prev[..., 6:9],
        s.disocclusion_threshold)
    valid = valid * common.in_screen(mv_xy, H, W).astype(vz.dtype)
    frames = jnp.minimum(prev[..., 9] * valid + 1.0, s.max_accumulated_frames)
    alpha = 1.0 / frames
    acc_i = prev[..., 0:3] * (1 - alpha[..., None]) + il * alpha[..., None]
    acc_i = jnp.where(valid[..., None] > 0, acc_i, il)
    return pos, valid, frames, alpha, acc_i


def finish(hi, il, vz, nrm, pm1, pm2, valid, frames, alpha, acc_i):
    lum = common.luminance(il)
    mu1 = jnp.where(valid > 0, pm1 * (1 - alpha) + lum * alpha, lum)
    mu2 = jnp.where(valid > 0, pm2 * (1 - alpha) + lum * lum * alpha, lum * lum)
    return acc_i, mu1, mu2, frames, relax.RelaxHistory(
        illum=acc_i, moments=jnp.stack([mu1, mu2], -1), view_z=vz, normal=nrm,
        frames=frames)


def x1(hi, il, vz, nrm, mv):
    pos, valid, frames, alpha, acc_i = core(hi, il, vz, nrm, mv)
    pm = filtering.sample_bilinear(hi.moments, pos)
    return finish(hi, il, vz, nrm, pm[..., 0], pm[..., 1], valid, frames,
                  alpha, acc_i)


def x2(hi, il, vz, nrm, mv):
    pos, valid, frames, alpha, acc_i = core(hi, il, vz, nrm, mv)
    pm1 = filtering.sample_bilinear(hi.moments[..., 0], pos)
    pm2 = filtering.sample_bilinear(hi.moments[..., 1], pos)
    return finish(hi, il, vz, nrm, pm1, pm2, valid, frames, alpha, acc_i)


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
    a = (hist, illum, vz, nrm, mv)
    bench('x1 dup 2ch gather', x1, *a)
    bench('x2 dup 2x plane gather', x2, *a)


if __name__ == '__main__':
    main()
