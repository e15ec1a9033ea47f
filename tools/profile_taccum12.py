"""TPU: layout hypothesis for the 16 ms temporal_accumulate.

If XLA assigns a non-default entry layout to history params (as gather
operands), every call relayouts ~10 MB over the axon tunnel. Variants:
  a) steady-state cycling (out -> next in)
  b) optimization_barrier BETWEEN params and gather (block layout propagation)
  c) gather from flat (N, C) packed with linear indices (v2 of
     profile_gather2, which measured 0.04 ms standalone)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import common, relax

H = W = 512
s = relax.RelaxSettings()


def mk():
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (H, W, 3), jnp.float32)
    vz = jnp.ones((H, W), jnp.float32)
    nrm = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((H, W, 3), jnp.float32)
    hist = relax.RelaxHistory.create(H, W, jnp.float32)
    return hist, illum, vz, nrm, mv


def taccum(hi, il, vz, nrm, mv, pre_barrier=False, flat_gather=False):
    planes = [hi.illum, hi.moments, hi.view_z, hi.normal, hi.frames]
    if pre_barrier:
        planes = list(jax.lax.optimization_barrier(tuple(planes)))
    if flat_gather:
        packed = jnp.concatenate(
            [p[..., None] if p.ndim == 2 else p for p in planes], axis=-1)
        c = packed.shape[-1]
        flat = packed.reshape(H * W, c)
        pos = common.pixel_positions(H, W) + mv[..., :2] - 0.5
        i0 = jnp.floor(pos).astype(jnp.int32)
        f = pos - i0
        x0 = jnp.clip(i0[..., 0], 0, W - 1)
        y0 = jnp.clip(i0[..., 1], 0, H - 1)
        x1 = jnp.clip(x0 + 1, 0, W - 1)
        y1 = jnp.clip(y0 + 1, 0, H - 1)
        fx, fy = f[..., 0:1], f[..., 1:2]
        g = lambda yy, xx: jnp.take(flat, (yy * W + xx).reshape(-1),
                                    axis=0).reshape(H, W, c)
        out = (g(y0, x0) * (1 - fx) * (1 - fy) + g(y0, x1) * fx * (1 - fy)
               + g(y1, x0) * (1 - fx) * fy + g(y1, x1) * fx * fy)
        prev_illum = out[..., 0:3]
        prev_moments = out[..., 3:5]
        prev_z = out[..., 5]
        prev_n = out[..., 6:9]
        prev_frames = out[..., 9]
    else:
        prev_illum, prev_moments, prev_z, prev_n, prev_frames = (
            common.reproject_many(planes, mv[..., :2]))
    valid = common.disocclusion_weight(
        vz, mv[..., 2], prev_z, nrm, prev_n, s.disocclusion_threshold)
    valid = valid * common.in_screen(mv[..., :2], H, W).astype(vz.dtype)
    frames = jnp.minimum(prev_frames * valid + 1.0, s.max_accumulated_frames)
    alpha = 1.0 / frames
    lum = common.luminance(il)
    new_moments = jnp.stack([lum, lum * lum], axis=-1)
    acc_illum = prev_illum * (1 - alpha[..., None]) + il * alpha[..., None]
    acc_illum = jnp.where(valid[..., None] > 0, acc_illum, il)
    acc_moments = (prev_moments * (1 - alpha[..., None])
                   + new_moments * alpha[..., None])
    acc_moments = jnp.where(valid[..., None] > 0, acc_moments, new_moments)
    return relax.RelaxHistory(illum=acc_illum, moments=acc_moments,
                              view_z=vz, normal=nrm, frames=frames)


def bench_cycled(name, fn, n=20):
    hist, illum, vz, nrm, mv = mk()
    fn = jax.jit(fn)
    hist = jax.block_until_ready(fn(hist, illum, vz, nrm, mv))
    hist = jax.block_until_ready(fn(hist, illum, vz, nrm, mv))
    t0 = time.perf_counter()
    for _ in range(n):
        hist = fn(hist, illum, vz, nrm, mv)
    jax.block_until_ready(hist)
    print(f'{name} (cycled): {(time.perf_counter()-t0)/n*1e3:.2f} ms',
          flush=True)


def bench_fixed(name, fn, n=20):
    hist, illum, vz, nrm, mv = mk()
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(hist, illum, vz, nrm, mv))
    out = jax.block_until_ready(fn(hist, illum, vz, nrm, mv))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(hist, illum, vz, nrm, mv)
    jax.block_until_ready(out)
    print(f'{name} (fixed): {(time.perf_counter()-t0)/n*1e3:.2f} ms',
          flush=True)


def main():
    base = lambda *a: taccum(*a)
    barrier = lambda *a: taccum(*a, pre_barrier=True)
    flat = lambda *a: taccum(*a, flat_gather=True)
    bench_fixed('base', base)
    bench_cycled('base', base)
    bench_fixed('pre-barrier', barrier)
    bench_fixed('flat-gather', flat)
    bench_cycled('flat-gather', flat)


if __name__ == '__main__':
    main()
