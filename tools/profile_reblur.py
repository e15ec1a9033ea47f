"""REBLUR piece-wise profile at 512^2 (all inputs as args, steady history)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from nrdsample_tpu.denoise import common, reblur
from nrdsample_tpu.mathlib import filtering


def bench(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f'{name}: {dt*1e3:.2f} ms', flush=True)
    return out


def main():
    h = w = 512
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (h, w, 3), jnp.float32)
    vz = jnp.ones((h, w), jnp.float32)
    nrm = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((h, w, 3), jnp.float32)
    hd = jax.random.uniform(key, (h, w), jnp.float32)
    frames = jnp.full((h, w), 7.0, jnp.float32)
    rough = jnp.full((h, w), 0.5, jnp.float32)
    s = reblur.ReblurSettings()

    bench('anti_firefly', jax.jit(common.anti_firefly), illum)
    bench('bicubic reproject', jax.jit(
        lambda img, mv: common.reproject(img, mv[..., :2], bicubic=True)),
        illum, mv)
    bench('bilinear reproject', jax.jit(
        lambda img, mv: common.reproject(img, mv[..., :2])), illum, mv)
    bench('adaptive_blur', jax.jit(
        lambda il, hd, vz, nrm, rg, fr: reblur.adaptive_blur(
            il, hd, vz, nrm, rg, fr, jnp.int32(7), s, False, 0.002)),
        illum, hd, vz, nrm, rough, frames)

    # single poisson tap: dynamic-offset bilinear of 3ch plane
    def one_tap(il, vz, fr):
        pos0 = common.pixel_positions(h, w)
        radius = s.blur_radius_px * (1.0 - 0.9 * fr / s.max_accumulated_frame_num
                                     if hasattr(s, 'max_accumulated_frame_num')
                                     else fr)
        radius = jnp.maximum(jnp.abs(vz), 1.0) * 3.0
        pos = pos0 + jnp.stack([radius * 0.3, radius * -0.2], axis=-1)
        return filtering.sample_bilinear(il, pos)
    bench('one dynamic tap 3ch', jax.jit(one_tap), illum, vz, frames)

    # static-offset equivalent (shifted) for comparison
    def static_taps(il, vz):
        acc = jnp.zeros_like(il)
        for dy, dx in ((3, 1), (-2, 2), (1, -3), (-1, -1), (2, 3), (-3, 0),
                       (0, 3), (3, -2)):
            acc = acc + common.shifted(il, dy, dx)
        return acc / 8.0
    bench('8 static taps 3ch', jax.jit(static_taps), illum, vz)


if __name__ == '__main__':
    main()
