"""TPU: taccum restructured so the packed gather has ONE consumer chain.

Prior finding: one blend consumer of a packed gather is fast, two is
catastrophic. Variants:
  A) split gathers: control (z, n, frames) and signal (illum, moments);
     the signal gather feeds exactly one packed blend, sliced afterwards
  B) A + optimization_barrier on (valid, alpha) before the blend
  C) single packed gather + barrier + packed blend (slice after)
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


def taccum_split(hi, il, vz, nrm, mv, barrier=False):
    mv_xy = mv[..., :2]
    # control gather: depth+normal+frames drive valid/alpha
    prev_z, prev_n, prev_frames = common.reproject_many(
        [hi.view_z, hi.normal, hi.frames], mv_xy)
    valid = common.disocclusion_weight(
        vz, mv[..., 2], prev_z, nrm, prev_n, s.disocclusion_threshold)
    valid = valid * common.in_screen(mv_xy, H, W).astype(vz.dtype)
    frames = jnp.minimum(prev_frames * valid + 1.0, s.max_accumulated_frames)
    alpha = 1.0 / frames
    if barrier:
        valid, alpha = jax.lax.optimization_barrier((valid, alpha))
    # signal gather: ONE packed blend consumer
    prev_sig = common.reproject(
        jnp.concatenate([hi.illum, hi.moments], axis=-1), mv_xy)
    lum = common.luminance(il)
    new_sig = jnp.concatenate(
        [il, lum[..., None], (lum * lum)[..., None]], axis=-1)
    acc = prev_sig * (1 - alpha[..., None]) + new_sig * alpha[..., None]
    acc = jnp.where(valid[..., None] > 0, acc, new_sig)
    return relax.RelaxHistory(illum=acc[..., 0:3], moments=acc[..., 3:5],
                              view_z=vz, normal=nrm, frames=frames)


def taccum_packed(hi, il, vz, nrm, mv):
    mv_xy = mv[..., :2]
    packed = jnp.concatenate(
        [hi.illum, hi.moments, hi.view_z[..., None], hi.normal,
         hi.frames[..., None]], axis=-1)
    prev = common.reproject(packed, mv_xy)
    prev = jax.lax.optimization_barrier(prev)
    prev_z, prev_n, prev_frames = prev[..., 5], prev[..., 6:9], prev[..., 9]
    valid = common.disocclusion_weight(
        vz, mv[..., 2], prev_z, nrm, prev_n, s.disocclusion_threshold)
    valid = valid * common.in_screen(mv_xy, H, W).astype(vz.dtype)
    frames = jnp.minimum(prev_frames * valid + 1.0, s.max_accumulated_frames)
    alpha = 1.0 / frames
    valid, alpha = jax.lax.optimization_barrier((valid, alpha))
    lum = common.luminance(il)
    new_sig = jnp.concatenate(
        [il, lum[..., None], (lum * lum)[..., None]], axis=-1)
    acc = prev[..., 0:5] * (1 - alpha[..., None]) + new_sig * alpha[..., None]
    acc = jnp.where(valid[..., None] > 0, acc, new_sig)
    return relax.RelaxHistory(illum=acc[..., 0:3], moments=acc[..., 3:5],
                              view_z=vz, normal=nrm, frames=frames)


def bench(name, fn, n=20):
    hist, illum, vz, nrm, mv = mk()
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(hist, illum, vz, nrm, mv))
    out = jax.block_until_ready(fn(hist, illum, vz, nrm, mv))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(hist, illum, vz, nrm, mv)
    jax.block_until_ready(out)
    print(f'{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms', flush=True)


def main():
    bench('A split gathers', lambda *a: taccum_split(*a))
    bench('B split + barrier', lambda *a: taccum_split(*a, barrier=True))
    bench('C packed + barriers', taccum_packed)


if __name__ == '__main__':
    main()
