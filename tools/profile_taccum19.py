"""TPU: minimal poison hunt. v2 (gather + valid + frames + illum blend) is
0.10 ms; v3c (v2 + RETURN stack([lum, lum^2])) is 570 ms. Which single extra
op flips it?

  y0 v2 control
  y1 + return luminance(il)
  y2 + return il[...,0]*il[...,1]
  y3 + return vz*vz
  y4 + return prev[...,3]*2
  y5 + return prev[...,3]*prev[...,4]
  y6 + mu1 blend only
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import common, relax
from nrdsample_tpu.mathlib import filtering

H = W = 512
s = relax.RelaxSettings()


def v2(hi, il, vz, nrm, mv):
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
    return prev, valid, frames, alpha, acc_i


def y0(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = v2(hi, il, vz, nrm, mv)
    return acc_i, prev[..., 3:5], frames


def y1(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = v2(hi, il, vz, nrm, mv)
    return acc_i, frames, common.luminance(il)


def y2(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = v2(hi, il, vz, nrm, mv)
    return acc_i, frames, il[..., 0] * il[..., 1]


def y3(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = v2(hi, il, vz, nrm, mv)
    return acc_i, frames, vz * vz


def y4(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = v2(hi, il, vz, nrm, mv)
    return acc_i, frames, prev[..., 3] * 2.0


def y5(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = v2(hi, il, vz, nrm, mv)
    return acc_i, frames, prev[..., 3] * prev[..., 4]


def y6(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = v2(hi, il, vz, nrm, mv)
    lum = common.luminance(il)
    mu1 = jnp.where(valid > 0, prev[..., 3] * (1 - alpha) + lum * alpha, lum)
    return acc_i, frames, mu1


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
    for name, fn in (('y0 control', y0), ('y1 +lum', y1), ('y2 +r*g', y2),
                     ('y3 +vz^2', y3), ('y4 +slice*2', y4),
                     ('y5 +slice*slice', y5), ('y6 +mu1 blend', y6)):
        bench(name, fn, *a)


if __name__ == '__main__':
    main()
