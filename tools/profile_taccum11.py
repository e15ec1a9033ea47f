"""TPU: bisect the 16 ms inside relax.temporal_accumulate.

Raw 2D gathers measured 0.04 ms (profile_gather2), so the cost is elsewhere:
candidates are reproject_many's inline index math, disocclusion_weight,
in_screen, or the output-layout of the new RelaxHistory.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import common, relax

H = W = 512


def bench(name, fn, *args, n=20):
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(*args))
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f'{name}: {dt*1e3:.2f} ms', flush=True)


def main():
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (H, W, 3), jnp.float32)
    vz = jnp.ones((H, W), jnp.float32)
    nrm = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((H, W, 3), jnp.float32)
    hist = relax.RelaxHistory.create(H, W, jnp.float32)
    s = relax.RelaxSettings()

    bench('reproject_many(hist planes)',
          lambda hi, mv: common.reproject_many(
              [hi.illum, hi.moments, hi.view_z, hi.normal, hi.frames],
              mv[..., :2]),
          hist, mv)
    bench('reproject single (H,W,3)',
          lambda img, mv: common.reproject(img, mv[..., :2]), illum, mv)
    bench('disocclusion_weight',
          lambda vz, mv, nrm: common.disocclusion_weight(
              vz, mv[..., 2], vz, nrm, nrm, s.disocclusion_threshold),
          vz, mv, nrm)
    bench('in_screen', lambda mv: common.in_screen(mv[..., :2], H, W), mv)

    def taccum_noreproj(hi, il, vz, nrm, mv):
        # temporal_accumulate with reprojection REPLACED by identity
        prev_illum, prev_moments = hi.illum, hi.moments
        prev_z, prev_n, prev_frames = hi.view_z, hi.normal, hi.frames
        valid = common.disocclusion_weight(
            vz, mv[..., 2], prev_z, nrm, prev_n, s.disocclusion_threshold)
        valid = valid * common.in_screen(mv[..., :2], H, W).astype(vz.dtype)
        frames = jnp.minimum(prev_frames * valid + 1.0,
                             s.max_accumulated_frames)
        alpha = 1.0 / frames
        lum = common.luminance(il)
        new_moments = jnp.stack([lum, lum * lum], axis=-1)
        acc_illum = prev_illum * (1 - alpha[..., None]) + il * alpha[..., None]
        acc_moments = (prev_moments * (1 - alpha[..., None])
                       + new_moments * alpha[..., None])
        return relax.RelaxHistory(illum=acc_illum, moments=acc_moments,
                                  view_z=vz, normal=nrm, frames=frames)

    bench('taccum WITHOUT reproject', taccum_noreproj, hist, illum, vz, nrm, mv)
    bench('taccum full',
          lambda hi, il, vz, nrm, mv: relax.temporal_accumulate(
              hi, il, vz, nrm, mv, s),
          hist, illum, vz, nrm, mv)


if __name__ == '__main__' and len(sys.argv) == 1:
    main()


def variant_barrier():
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (H, W, 3), jnp.float32)
    vz = jnp.ones((H, W), jnp.float32)
    nrm = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((H, W, 3), jnp.float32)
    hist = relax.RelaxHistory.create(H, W, jnp.float32)
    s = relax.RelaxSettings()

    def taccum_barrier(hi, il, vz, nrm, mv):
        reproj = common.reproject_many(
            [hi.illum, hi.moments, hi.view_z, hi.normal, hi.frames],
            mv[..., :2])
        # materialize the gather once instead of letting XLA fuse it into
        # every consumer loop
        reproj = jax.lax.optimization_barrier(tuple(reproj))
        prev_illum, prev_moments, prev_z, prev_n, prev_frames = reproj
        valid = common.disocclusion_weight(
            vz, mv[..., 2], prev_z, nrm, prev_n, s.disocclusion_threshold)
        valid = valid * common.in_screen(mv[..., :2], H, W).astype(vz.dtype)
        frames = jnp.minimum(prev_frames * valid + 1.0,
                             s.max_accumulated_frames)
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

    bench('taccum + opt_barrier', taccum_barrier, hist, illum, vz, nrm, mv)


if __name__ == '__main__' and len(sys.argv) > 1 and sys.argv[1] == 'barrier':
    variant_barrier()
