"""TPU: 'gather pass' feasibility — do MULTIPLE pure gathers in one program
all stay on the fast emitter when the program contains nothing else?

  q1 two packed footprint gathers (10ch + 9ch), raw outputs
  q2 four packed gathers (RELAX diff/spec + REBLUR + SIGMA shapes)
  q3 one bilinear + one 5-tap bicubic (TAA history shape)
  q4 NO gathers: eight computed elementwise (H,W) outputs (z1-class overhead
     scaling — what a split's part-B would pay)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import common
from nrdsample_tpu.mathlib import filtering

H = W = 512


def q1(a10, a9, pos):
    return (filtering.sample_bilinear(a10, pos),
            filtering.sample_bilinear(a9, pos))


def q2(a10, a9, a2, pos):
    return (filtering.sample_bilinear(a10, pos),
            filtering.sample_bilinear(a10, pos + 1.0),
            filtering.sample_bilinear(a9, pos),
            filtering.sample_bilinear(a2, pos))


def q3(a10, a3, pos):
    return (filtering.sample_bilinear(a10, pos),
            filtering.sample_bicubic_no_corners(a3, pos))


def q4(a10, a9, pos):
    x = a10[..., 0]
    y = a9[..., 0]
    return (x * x, x + y, x - y, x * y, jnp.sqrt(jnp.abs(x) + 1e-6),
            jnp.exp(-y * y), jnp.minimum(x, y), jnp.maximum(x, y))


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
    k1, k2, k3, k4 = jax.random.split(key, 4)
    a10 = jax.random.uniform(k1, (H, W, 10), jnp.float32)
    a9 = jax.random.uniform(k2, (H, W, 9), jnp.float32)
    a3 = jax.random.uniform(k3, (H, W, 3), jnp.float32)
    a2 = jax.random.uniform(k4, (H, W, 2), jnp.float32)
    pos = jnp.asarray(common.pixel_positions(H, W)) + 0.3
    bench('q1 2 gathers', q1, a10, a9, pos)
    bench('q2 4 gathers', q2, a10, a9, a2, pos)
    bench('q3 bilinear+bicubic', q3, a10, a3, pos)
    bench('q4 8 elementwise outs', q4, a10, a9, pos)


if __name__ == '__main__':
    main()
