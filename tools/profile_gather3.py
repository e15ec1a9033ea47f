"""TPU gather timing with PER-CALL block_until_ready (the loop-then-sync
pattern under-reported: trace showed 13.9 ms device time while the loop
measured 0.04 ms/call).

Variants:
  g1 packed (H,W,10) 2D gather, indices as ARGS
  g2 same, indices computed inline from mv
  g3 separable take_along_axis (axis0 then axis1)
  g4 one gather with slice_sizes (2,2) footprint (4 taps in one op)
  g5 bf16 packed gather
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

H = W = 512
C = 10


def bench(name, fn, *args, n=6):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f'{name}: {dt*1e3:.2f} ms', flush=True)


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
    ix = jnp.clip(i0[..., 0], 0, W - 1)
    iy = jnp.clip(i0[..., 1], 0, H - 1)

    bench('g1 2D gather, arg indices', lambda im, ix, iy: im[iy, ix],
          img, ix, iy)

    def g2(im, mv):
        pos = (jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                                      jnp.arange(H, dtype=jnp.float32)),
                         axis=-1) + 0.5 + mv)
        i0 = jnp.floor(pos - 0.5).astype(jnp.int32)
        return im[jnp.clip(i0[..., 1], 0, H - 1),
                  jnp.clip(i0[..., 0], 0, W - 1)]
    bench('g2 2D gather, inline indices', g2, img, mv)

    def g3(im, ix, iy):
        t = jnp.take_along_axis(im, iy[..., None], axis=0)
        return jnp.take_along_axis(t, ix[..., None], axis=1)
    bench('g3 separable take_along_axis', g3, img, ix, iy)

    def g4(im, ix, iy):
        # one gather fetching the full 2x2 bilinear footprint per pixel
        idx = jnp.stack([iy.reshape(-1), ix.reshape(-1)], axis=-1)
        out = jax.lax.gather(
            im, idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(2, 2, C), mode='clip')
        return out.reshape(H, W, 2, 2, C)
    bench('g4 footprint gather (2,2,C)', g4, img, ix, iy)

    imgb = img.astype(jnp.bfloat16)
    bench('g5 bf16 2D gather', lambda im, ix, iy: im[iy, ix], imgb, ix, iy)

    bench('g6 elementwise baseline (x*2+1)', lambda im: im * 2 + 1, img)


if __name__ == '__main__':
    main()
