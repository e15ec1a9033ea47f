"""TPU: binary-search which structural element of taccum triggers the 540 ms
gather slow path. c1-standalone (arg operand, arg indices, raw return) is
0.09 ms; full taccum is 540 ms. Steps:
  t1 concat-of-5-params operand + inline mv indices -> blended (H,W,10) out
  t2 t1 + slice into 5 planes (returned as tuple)
  t3 t2 + disocclusion/valid math consuming the control slices
  t4 full temporal_accumulate
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import common, relax
from nrdsample_tpu.mathlib import filtering

H = W = 512
s = relax.RelaxSettings()


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


def mk():
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (H, W, 3), jnp.float32)
    vz = jnp.ones((H, W), jnp.float32)
    nrm = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((H, W, 3), jnp.float32)
    hist = relax.RelaxHistory.create(H, W, jnp.float32)
    return hist, illum, vz, nrm, mv


def packed_reproject(hi, mv):
    packed = jnp.concatenate(
        [hi.illum, hi.moments, hi.view_z[..., None], hi.normal,
         hi.frames[..., None]], axis=-1)
    pos = common.pixel_positions(H, W) + mv[..., :2]
    return filtering.sample_bilinear(packed, pos)


def t1(hi, il, vz, nrm, mv):
    return packed_reproject(hi, mv)


def t2(hi, il, vz, nrm, mv):
    out = packed_reproject(hi, mv)
    return out[..., 0:3], out[..., 3:5], out[..., 5], out[..., 6:9], out[..., 9]


def t3(hi, il, vz, nrm, mv):
    pi, pm, pz, pn, pf = t2(hi, il, vz, nrm, mv)
    valid = common.disocclusion_weight(
        vz, mv[..., 2], pz, nrm, pn, s.disocclusion_threshold)
    valid = valid * common.in_screen(mv[..., :2], H, W).astype(vz.dtype)
    return pi, pm, pf, valid


def t4(hi, il, vz, nrm, mv):
    return relax.temporal_accumulate(hi, il, vz, nrm, mv, s)


def main():
    hist, illum, vz, nrm, mv = mk()
    for name, fn in (('t1 concat+inline-idx raw', t1),
                     ('t2 + plane slices', t2),
                     ('t3 + valid math', t3),
                     ('t4 full taccum', t4)):
        bench(name, fn, hist, illum, vz, nrm, mv)


if __name__ == '__main__':
    main()
