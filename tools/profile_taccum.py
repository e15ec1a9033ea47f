"""TPU bisection of the relax temporal_accumulate 249ms anomaly at 1080p."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.denoise import common, relax


def bench(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f'{name}: {dt*1e3:.2f} ms', flush=True)
    return out


def main():
    h, w = 1080, 1920
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (h, w, 3), jnp.float32)
    vz = jnp.ones((h, w), jnp.float32)
    nrm = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    mv = jnp.stack([jnp.sin(yy * 0.01) * 4, jnp.cos(xx * 0.013) * 2,
                    jnp.zeros_like(xx)], axis=-1)
    hist = relax.RelaxHistory.create(h, w, jnp.float32)
    s = relax.RelaxSettings()

    def stage(n_stages, barrier=False):
        def f(hi, il, mv):
            mv_xy = mv[..., :2]
            outs = common.reproject_many(
                [hi.illum, hi.moments, hi.view_z, hi.normal, hi.frames], mv_xy)
            if barrier:
                outs = jax.lax.optimization_barrier(tuple(outs))
            prev_illum, prev_moments, prev_z, prev_n, prev_frames = outs
            if n_stages == 1:
                return prev_illum
            valid = common.disocclusion_weight(
                vz, mv[..., 2], prev_z, nrm, prev_n, s.disocclusion_threshold)
            if n_stages == 2:
                return valid
            valid = valid * common.in_screen(mv_xy, h, w).astype(vz.dtype)
            if n_stages == 3:
                return valid
            frames = jnp.minimum(prev_frames * valid + 1.0, s.max_accumulated_frames)
            alpha = 1.0 / frames
            lum = common.luminance(il)
            new_moments = jnp.stack([lum, lum * lum], axis=-1)
            acc_illum = prev_illum * (1 - alpha[..., None]) + il * alpha[..., None]
            acc_illum = jnp.where(valid[..., None] > 0, acc_illum, il)
            acc_moments = prev_moments * (1 - alpha[..., None]) + new_moments * alpha[..., None]
            acc_moments = jnp.where(valid[..., None] > 0, acc_moments, new_moments)
            return acc_illum, acc_moments, frames
        return f

    for n_stages in (1, 2, 3, 4):
        bench(f'stages<={n_stages}', jax.jit(stage(n_stages)), hist, illum, mv)
    for n_stages in (2, 3, 4):
        bench(f'stages<={n_stages} +barrier', jax.jit(stage(n_stages, True)),
              hist, illum, mv)

    # full production fn with and without barrier for reference
    bench('temporal_accumulate', jax.jit(
        lambda hi, il, mv: relax.temporal_accumulate(hi, il, vz, nrm, mv, s)),
        hist, illum, mv)


if __name__ == '__main__':
    main()
