"""TPU: bilinear-reprojection gather formulation shootout.

All operands are jit ARGUMENTS (tunnel-constant discipline). Candidates:
  v1 packed (H, W, C=10) 2D gather (current common.reproject path)
  v2 flat (N, C) jnp.take rows by linear index
  v3 flat padded (N, 128) take (full-lane rows)
  v4 per-channel (H, W) 2D gather x C
  v5 separable: take_along_axis axis 0 then axis 1 (APPROX at MV x-variation)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

H = W = 512
C = 10


def bench(name, fn, *args, n=20):
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(*args))
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f'{name}: {dt*1e3:.2f} ms -> {H*W/dt/1e6:.1f} Mpix/s', flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W, C), jnp.float32)
    # smooth-ish motion field, +-20 px
    mv = 20.0 * jnp.sin(
        jnp.stack(jnp.meshgrid(jnp.linspace(0, 6, W), jnp.linspace(0, 6, H)),
                  axis=-1))
    pos = (jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                                  jnp.arange(H, dtype=jnp.float32)), axis=-1)
           + 0.5 + mv)
    p = pos - 0.5
    i0 = jnp.floor(p).astype(jnp.int32)
    ix = jnp.clip(i0[..., 0], 0, W - 1)
    iy = jnp.clip(i0[..., 1], 0, H - 1)

    def v1(img, ix, iy):
        return img[iy, ix]

    def v2(img, ix, iy):
        flat = img.reshape(H * W, C)
        return jnp.take(flat, iy * W + ix, axis=0).reshape(H, W, C)

    def v3(imgp, ix, iy):
        return jnp.take(imgp, (iy * W + ix).reshape(-1), axis=0)

    def v4(img, ix, iy):
        return jnp.stack([img[..., c][iy, ix] for c in range(C)], axis=-1)

    def v5(img, ix, iy):
        # separable: rows then columns (approximate for x-varying iy)
        t = jnp.take_along_axis(img, iy[..., None], axis=0)
        return jnp.take_along_axis(t, ix[..., None], axis=1)

    imgp = jnp.pad(img, ((0, 0), (0, 0), (0, 128 - C))).reshape(H * W, 128)

    bench('v1 packed (H,W,10) 2D gather', v1, img, ix, iy)
    bench('v2 flat (N,10) take', v2, img, ix, iy)
    bench('v3 flat (N,128) take', v3, imgp, ix, iy)
    bench('v4 per-channel 2D gather', v4, img, ix, iy)
    bench('v5 separable take_along_axis', v5, img, ix, iy)


if __name__ == '__main__':
    main()
