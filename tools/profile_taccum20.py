"""TPU: output-structure probes. y-series showed: gather + 2 computed outputs
fast, + any 3rd computed output (even vz*vz) -> 570 ms.

  z1 NO gather, 3 computed elementwise outputs (is the cliff gather-specific?)
  z2 v2 + lum + vz^2 but ALL packed into ONE concat output
  z3 full taccum packed into ONE (H,W,6) output [acc_i, mu1, mu2, frames]
  z4 z3 + valid as a second computed output
  z5 z3 + one atrous iteration on the packed slices (downstream compute)
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
    return prev, valid, frames, alpha, acc_i


def z1(hi, il, vz, nrm, mv):
    return vz * vz, common.luminance(il), vz + mv[..., 2]


def z2(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = core(hi, il, vz, nrm, mv)
    lum = common.luminance(il)
    return jnp.concatenate(
        [acc_i, (vz * vz)[..., None], lum[..., None], frames[..., None]], -1)


def _packed_taccum(hi, il, vz, nrm, mv):
    prev, valid, frames, alpha, acc_i = core(hi, il, vz, nrm, mv)
    lum = common.luminance(il)
    mu1 = jnp.where(valid > 0, prev[..., 3] * (1 - alpha) + lum * alpha, lum)
    mu2 = jnp.where(valid > 0, prev[..., 4] * (1 - alpha) + lum * lum * alpha,
                    lum * lum)
    out = jnp.concatenate(
        [acc_i, mu1[..., None], mu2[..., None], frames[..., None]], -1)
    return out, valid


def z3(hi, il, vz, nrm, mv):
    return _packed_taccum(hi, il, vz, nrm, mv)[0]


def z4(hi, il, vz, nrm, mv):
    return _packed_taccum(hi, il, vz, nrm, mv)


def z5(hi, il, vz, nrm, mv):
    out = _packed_taccum(hi, il, vz, nrm, mv)[0]
    acc_i, mu1, mu2, frames = out[..., 0:3], out[..., 3], out[..., 4], out[..., 5]
    var = jnp.maximum(mu2 - mu1 * mu1, 0.0)
    o, v = relax.atrous_iteration(acc_i, var, vz, nrm, 1, s)
    return o, v, frames


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
    for name, fn in (('z1 no-gather 3 outs', z1), ('z2 packed extras', z2),
                     ('z3 packed taccum', z3), ('z4 z3+valid', z4),
                     ('z5 z3+atrous', z5)):
        bench(name, fn, *a)


if __name__ == '__main__':
    main()
