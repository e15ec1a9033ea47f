"""TPU: constant-upload theory. If XLA folds pixel_positions (iota meshgrid)
into literal constants in 'poisoned' graph shapes, axon re-uploads MBs per
call (~31 MB/s tunnel) -> the 570 ms. Probes:

  p3 control: full taccum (expect ~570 ms)
  p1 pos passed as ARG (no iota inside)          -> fast if theory holds
  p2 iota barriered inside pixel_positions       -> fast if theory holds
Plus: dump p3's optimized HLO and report total bytes of large constants.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import re, time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import common, relax
from nrdsample_tpu.mathlib import filtering

H = W = 512
s = relax.RelaxSettings()


def taccum_posarg(hi, il, vz, nrm, mv, pos):
    mv_xy = mv[..., :2]
    packed = jnp.concatenate(
        [hi.illum, hi.moments, hi.view_z[..., None], hi.normal,
         hi.frames[..., None]], axis=-1)
    prev = filtering.sample_bilinear(packed, pos)
    valid = common.disocclusion_weight(
        vz, mv[..., 2], prev[..., 5], nrm, prev[..., 6:9],
        s.disocclusion_threshold)
    inb = ((pos[..., 0] >= 0) & (pos[..., 0] <= W)
           & (pos[..., 1] >= 0) & (pos[..., 1] <= H))
    valid = valid * inb.astype(vz.dtype)
    frames = jnp.minimum(prev[..., 9] * valid + 1.0, s.max_accumulated_frames)
    alpha = 1.0 / frames
    lum = common.luminance(il)
    mu1 = jnp.where(valid > 0, prev[..., 3] * (1 - alpha) + lum * alpha, lum)
    mu2 = jnp.where(valid > 0, prev[..., 4] * (1 - alpha) + lum * lum * alpha,
                    lum * lum)
    acc_i = prev[..., 0:3] * (1 - alpha[..., None]) + il * alpha[..., None]
    acc_i = jnp.where(valid[..., None] > 0, acc_i, il)
    return acc_i, mu1, mu2, frames


def pixel_positions_barrier(h, w):
    x = jax.lax.optimization_barrier(jnp.arange(w, dtype=jnp.float32)) + 0.5
    y = jax.lax.optimization_barrier(jnp.arange(h, dtype=jnp.float32)) + 0.5
    gx, gy = jnp.meshgrid(x, y)
    return jnp.stack([gx, gy], axis=-1)


def taccum_bar(hi, il, vz, nrm, mv):
    pos = pixel_positions_barrier(H, W) + mv[..., :2]
    return taccum_posarg(hi, il, vz, nrm, mv, pos)


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

    # constant census of the SLOW program
    lowered = jax.jit(lambda *a: relax.temporal_accumulate(*a, s)).lower(
        hist, illum, vz, nrm, mv)
    txt = lowered.compile().as_text()
    big = 0
    for m in re.finditer(r'constant\(([^)]*)\)', txt):
        pass
    # crude census: count f32[...] literals by shape annotations on constants
    for m in re.finditer(r'(f32|s32|u32)\[([0-9,]*)\][^=]*=\s*constant', txt):
        dims = [int(d) for d in m.group(2).split(',') if d]
        n = 1
        for d in dims:
            n *= d
        if n >= 1024:
            big += n * 4
    print(f'p3 large-literal bytes in optimized HLO: {big/1e6:.2f} MB',
          flush=True)

    pos = jnp.asarray(common.pixel_positions(H, W))
    bench('p1 pos as arg', taccum_posarg, hist, illum, vz, nrm, mv, pos)
    bench('p2 iota barriered', taccum_bar, hist, illum, vz, nrm, mv)
    bench('p3 control taccum', lambda *a: relax.temporal_accumulate(*a, s),
          hist, illum, vz, nrm, mv)


if __name__ == '__main__':
    main()
