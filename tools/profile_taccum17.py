"""TPU: v2(+illum blend)=0.10ms, v3(+moments blend)=567ms. Which element of
the moments blend poisons the gather emitter?

  v3c v2 + compute nm = stack([lum, lum^2]) and return it RAW (no blend)
  w1  v3 but prev-moments slice barriered before the blend
  w2  moments blended as TWO separate (H,W) planes (no (H,W,2) arithmetic)
  w3  w2 + stack the blended planes into (H,W,2) at the end
  w4  full taccum restructured in the w3 style (candidate relax.py fix)
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
    valid = common.disocclusion_weight(
        vz, mv[..., 2], prev[..., 5], nrm, prev[..., 6:9],
        s.disocclusion_threshold)
    valid = valid * common.in_screen(mv_xy, H, W).astype(vz.dtype)
    frames = jnp.minimum(prev[..., 9] * valid + 1.0, s.max_accumulated_frames)
    alpha = 1.0 / frames
    acc_i = prev[..., 0:3] * (1 - alpha[..., None]) + il * alpha[..., None]
    acc_i = jnp.where(valid[..., None] > 0, acc_i, il)
    return prev, valid, frames, alpha, acc_i


def v3c(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = base(hi, il, vz, nrm, mv)
    lum = common.luminance(il)
    nm = jnp.stack([lum, lum * lum], axis=-1)
    return acc_i, nm, frames


def w1(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = base(hi, il, vz, nrm, mv)
    lum = common.luminance(il)
    nm = jnp.stack([lum, lum * lum], axis=-1)
    pm = jax.lax.optimization_barrier(prev[..., 3:5])
    acc_m = pm * (1 - alpha[..., None]) + nm * alpha[..., None]
    acc_m = jnp.where(valid[..., None] > 0, acc_m, nm)
    return acc_i, acc_m, frames


def _w2(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = base(hi, il, vz, nrm, mv)
    lum = common.luminance(il)
    mu1 = prev[..., 3] * (1 - alpha) + lum * alpha
    mu2 = prev[..., 4] * (1 - alpha) + lum * lum * alpha
    mu1 = jnp.where(valid > 0, mu1, lum)
    mu2 = jnp.where(valid > 0, mu2, lum * lum)
    return acc_i, mu1, mu2, frames


def w2(hi, il, vz, nrm, mv):
    return _w2(hi, il, vz, nrm, mv)


def w3(hi, il, vz, nrm, mv):
    acc_i, mu1, mu2, frames = _w2(hi, il, vz, nrm, mv)
    return acc_i, jnp.stack([mu1, mu2], axis=-1), frames


def w4(hi, il, vz, nrm, mv):
    acc_i, mu1, mu2, frames = _w2(hi, il, vz, nrm, mv)
    acc_m = jnp.stack([mu1, mu2], axis=-1)
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
    for name, fn in (('v3c +nm raw', v3c), ('w1 barrier pm', w1),
                     ('w2 split planes', w2), ('w3 +stack', w3),
                     ('w4 full hist', w4)):
        bench(name, fn, *a)


if __name__ == '__main__':
    main()
