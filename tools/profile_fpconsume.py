"""TPU: how to CONSUME the (M,2,2,C) footprint-gather block without the
pathological tiny-dim slices (measured 540 ms in taccum context).

  c1 slices (current sample_bilinear)
  c2 multiply-by-weights + sum over (1,2)
  c3 reshape to (M, 4C) + contiguous lane slices
  c4 full taccum built on the winning consumption
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

H = W = 512
C = 10
M = H * W


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


def footprint(im, iy, ix):
    idx = jnp.stack([iy.reshape(-1), ix.reshape(-1)], axis=-1)
    return jax.lax.gather(
        im, idx,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(2, 2, C), mode='clip')


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W, C), jnp.float32)
    mv = 20.0 * jnp.sin(
        jnp.stack(jnp.meshgrid(jnp.linspace(0, 6, W), jnp.linspace(0, 6, H)),
                  axis=-1))
    pos = (jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                                  jnp.arange(H, dtype=jnp.float32)), axis=-1)
           + 0.5 + mv)
    p = pos - 0.5
    i0 = jnp.floor(p).astype(jnp.int32)
    ix = jnp.clip(i0[..., 0], 0, W - 2)
    iy = jnp.clip(i0[..., 1], 0, H - 2)
    fx = jnp.clip(p[..., 0] - ix, 0.0, 1.0).reshape(M, 1)
    fy = jnp.clip(p[..., 1] - iy, 0.0, 1.0).reshape(M, 1)

    def c1(im, iy, ix, fx, fy):
        blk = footprint(im, iy, ix)  # (M, 2, 2, C)
        out = (blk[:, 0, 0] * (1 - fx) * (1 - fy) + blk[:, 0, 1] * fx * (1 - fy)
               + blk[:, 1, 0] * (1 - fx) * fy + blk[:, 1, 1] * fx * fy)
        return out.reshape(H, W, C) * 2.0 + 1.0

    def c2(im, iy, ix, fx, fy):
        blk = footprint(im, iy, ix)
        wy = jnp.stack([1 - fy, fy], axis=1)          # (M, 2, 1)
        wx = jnp.stack([1 - fx, fx], axis=1)          # (M, 2, 1)
        w = wy[:, :, None, :] * wx[:, None, :, :]      # (M, 2, 2, 1)
        out = (blk * w).sum(axis=(1, 2))
        return out.reshape(H, W, C) * 2.0 + 1.0

    def c3(im, iy, ix, fx, fy):
        blk = footprint(im, iy, ix).reshape(M, 4 * C)
        out = (blk[:, 0:C] * (1 - fx) * (1 - fy)
               + blk[:, C:2*C] * fx * (1 - fy)
               + blk[:, 2*C:3*C] * (1 - fx) * fy
               + blk[:, 3*C:4*C] * fx * fy)
        return out.reshape(H, W, C) * 2.0 + 1.0

    bench('c1 tiny-dim slices + blend', c1, img, iy, ix, fx, fy)
    bench('c2 weight-mul + reduce', c2, img, iy, ix, fx, fy)
    bench('c3 flat (M,4C) lane slices', c3, img, iy, ix, fx, fy)


if __name__ == '__main__':
    main()
