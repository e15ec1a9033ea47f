"""TPU: fine bisect of t3(fast, 0.09ms) -> t4(slow, 570ms) in taccum.

Each variant adds one op group on top of the packed footprint gather:
  v0 slices + valid math (== t14.t3)
  v1 + frames = min(prev_frames*valid + 1, 30)
  v2 + alpha = 1/frames; illum blend + where
  v3 + moments blend + where (stack'd new moments)
  v3b like v3 but ONE packed 5ch blend, slices after
  v4 + history passthrough outputs (vz, nrm returned too) == full t4
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import common, relax
from nrdsample_tpu.mathlib import filtering

H = W = 512
s = relax.RelaxSettings()


def base(hi, il, vz, nrm, mv):
    mv_xy = mv[..., :2]
    packed = jnp.concatenate(
        [hi.illum, hi.moments, hi.view_z[..., None], hi.normal,
         hi.frames[..., None]], axis=-1)
    pos = common.pixel_positions(H, W) + mv_xy
    prev = filtering.sample_bilinear(packed, pos)
    pi, pm = prev[..., 0:3], prev[..., 3:5]
    pz, pn, pf = prev[..., 5], prev[..., 6:9], prev[..., 9]
    valid = common.disocclusion_weight(
        vz, mv[..., 2], pz, nrm, pn, s.disocclusion_threshold)
    valid = valid * common.in_screen(mv_xy, H, W).astype(vz.dtype)
    return pi, pm, pf, valid


def v0(hi, il, vz, nrm, mv):
    return base(hi, il, vz, nrm, mv)


def v1(hi, il, vz, nrm, mv):
    pi, pm, pf, valid = base(hi, il, vz, nrm, mv)
    frames = jnp.minimum(pf * valid + 1.0, s.max_accumulated_frames)
    return pi, pm, frames, valid


def v2(hi, il, vz, nrm, mv):
    pi, pm, frames, valid = v1(hi, il, vz, nrm, mv)
    alpha = 1.0 / frames
    acc_i = pi * (1 - alpha[..., None]) + il * alpha[..., None]
    acc_i = jnp.where(valid[..., None] > 0, acc_i, il)
    return acc_i, pm, frames


def v3(hi, il, vz, nrm, mv):
    pi, pm, frames, valid = v1(hi, il, vz, nrm, mv)
    alpha = 1.0 / frames
    lum = common.luminance(il)
    nm = jnp.stack([lum, lum * lum], axis=-1)
    acc_i = pi * (1 - alpha[..., None]) + il * alpha[..., None]
    acc_i = jnp.where(valid[..., None] > 0, acc_i, il)
    acc_m = pm * (1 - alpha[..., None]) + nm * alpha[..., None]
    acc_m = jnp.where(valid[..., None] > 0, acc_m, nm)
    return acc_i, acc_m, frames


def v3b(hi, il, vz, nrm, mv):
    pi, pm, frames, valid = v1(hi, il, vz, nrm, mv)
    alpha = 1.0 / frames
    lum = common.luminance(il)
    new_sig = jnp.concatenate([il, lum[..., None], (lum * lum)[..., None]], -1)
    prev_sig = jnp.concatenate([pi, pm], -1)
    acc = prev_sig * (1 - alpha[..., None]) + new_sig * alpha[..., None]
    acc = jnp.where(valid[..., None] > 0, acc, new_sig)
    return acc[..., 0:3], acc[..., 3:5], frames


def v4(hi, il, vz, nrm, mv):
    acc_i, acc_m, frames = v3(hi, il, vz, nrm, mv)
    return acc_i, acc_m, frames, relax.RelaxHistory(
        illum=acc_i, moments=acc_m, view_z=vz, normal=nrm, frames=frames)


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
    for name, fn in (('v0 slices+valid', v0), ('v1 +frames', v1),
                     ('v2 +illum blend', v2), ('v3 +moments blend', v3),
                     ('v3b packed blend', v3b), ('v4 +hist passthrough', v4)):
        bench(name, fn, *a)


if __name__ == '__main__':
    main()
