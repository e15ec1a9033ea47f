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




def main2():
    """Round-5: full-pipeline decomposition at 512^2 (REBLUR now runs inside
    the headline benched frame -> it must be ~ms-scale)."""
    h = w = 512
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (h, w, 3), jnp.float32)
    vz = jnp.ones((h, w), jnp.float32)
    nrm = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((h, w, 3), jnp.float32)
    hd = jax.random.uniform(key, (h, w), jnp.float32)
    rough = jnp.full((h, w), 0.5, jnp.float32)
    frames = jnp.full((h, w), 7.0, jnp.float32)
    s = reblur.ReblurSettings()
    hist = reblur.ReblurHistory.create(h, w)

    bench('full denoise', jax.jit(
        lambda hi, il, hd_, vz_, nrm_, rg, mv_: reblur.denoise(
            hi, il, hd_, vz_, nrm_, rg, mv_, jnp.int32(7), 0.002, s)[0]),
        hist, illum, hd, vz, nrm, rough, mv)
    bench('accumulate', jax.jit(
        lambda hi, il, hd_, vz_, nrm_, mv_: reblur.accumulate(
            hi, il, hd_, vz_, nrm_, mv_, s)[0]),
        hist, illum, hd, vz, nrm, mv)
    bench('history_fix', jax.jit(
        lambda il, vz_, nrm_, fr: reblur.history_fix(il, il, vz_, nrm_, fr, s)[0]),
        illum, vz, nrm, frames)
    bench('adaptive_blur (again)', jax.jit(
        lambda il, hd_, vz_, nrm_, rg, fr: reblur.adaptive_blur(
            il, hd_, vz_, nrm_, rg, fr, jnp.int32(7), s, False, 0.002)[0]),
        illum, hd, vz, nrm, rough, frames)
    bench('stabilize', jax.jit(
        lambda il, fr: reblur.stabilize(il, il, fr, s)),
        illum, frames)
    from nrdsample_tpu.denoise import gatherpass
    bench('taccum gathers (inline)', jax.jit(
        lambda hi, mv_: gatherpass.execute_inline(
            reblur.taccum_requests(hi, mv_[..., :2]),
            {"illum": gatherpass.BICUBIC, "packed": gatherpass.BILINEAR})["illum"]),
        hist, mv)


if __name__ == '__main__':
    import sys as _s
    (main2 if '2' in _s.argv[1:] else main)()
