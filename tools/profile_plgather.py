"""TPU: which dynamic-gather forms does Mosaic lower inside a Pallas kernel?

  g1 lane gather    out[i,j] = src[i, idx[i,j]]   (take_along_axis axis=1)
  g2 sublane gather out[i,j] = src[idx[i,j], j]   (take_along_axis axis=0)
  g3 row gather     out[k,:] = src[idx[k], :]     (jnp.take axis=0)

Each is checked for (a) does it compile at all, (b) numeric parity vs XLA,
(c) runtime at denoiser-relevant sizes. This decides whether the windowed
Pallas reproject kernel is buildable (lane gather within a window + sublane
gather across window rows).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _k_lane(src_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=1)


def _k_sublane(src_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(src_ref[...], idx_ref[...], axis=0)


def _k_row(src_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take(src_ref[...], idx_ref[...], axis=0)


def trial(name, kernel, src, idx, want):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(want.shape, src.dtype),
        )
        fn = jax.jit(fn)
        out = jax.block_until_ready(fn(src, idx))
        ok = np.allclose(np.asarray(out), want)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(src, idx))
            ts.append(time.perf_counter() - t0)
        print(f'{name}: ok={ok} {min(ts)*1e3:.3f} ms', flush=True)
    except Exception as e:
        msg = str(e).split(chr(10))[0][:160]
        print(f'{name}: FAIL {type(e).__name__}: {msg}', flush=True)


def main():
    rng = np.random.default_rng(0)
    # denoiser-ish sizes: 512x512 image
    src = jnp.asarray(rng.standard_normal((512, 512), dtype=np.float32))
    idx1 = jnp.asarray(rng.integers(0, 512, (512, 512)), jnp.int32)
    want1 = np.take_along_axis(np.asarray(src), np.asarray(idx1), axis=1)
    trial('g1 lane  512x512', _k_lane, src, idx1, want1)
    want2 = np.take_along_axis(np.asarray(src), np.asarray(idx1), axis=0)
    trial('g2 subl  512x512', _k_sublane, src, idx1, want2)
    # window-sized sublane gather (48 source rows)
    srcw = jnp.asarray(rng.standard_normal((64, 512), dtype=np.float32))
    idxw = jnp.asarray(rng.integers(0, 64, (512, 512)), jnp.int32)
    wantw = np.take_along_axis(
        np.broadcast_to(np.asarray(srcw), (64, 512)), np.asarray(idxw)[:64],
        axis=0)
    try:
        fn = pl.pallas_call(
            _k_sublane,
            out_shape=jax.ShapeDtypeStruct((64, 512), jnp.float32))
        out = jax.block_until_ready(jax.jit(fn)(srcw, idxw[:64]))
        ok = np.allclose(np.asarray(out), wantw)
        print(f'g2w subl 64x512 win: ok={ok}', flush=True)
    except Exception as e:
        print(f'g2w subl 64x512 win: FAIL {type(e).__name__}: '
              f'{str(e).split(chr(10))[0][:160]}', flush=True)
    idx3 = jnp.asarray(rng.integers(0, 512, (512,)), jnp.int32)
    want3 = np.asarray(src)[np.asarray(idx3)]
    trial('g3 row   512x512', _k_row, src, idx3, want3)


if __name__ == '__main__':
    main()
