"""TPU profile: RELAX denoiser stack component breakdown.

Times the full relax.denoise plus its pieces (temporal accumulate, variance,
single/5x atrous chain) at 512^2 and 1080p. Run by absolute path on axon.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.denoise import relax, common


def bench(name, fn, *args, n=10, pix=None):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    msg = f'{name}: {dt*1e3:.2f} ms'
    if pix:
        msg += f' -> {pix/dt/1e6:.1f} Mpix/s'
    print(msg, flush=True)
    return out


def run(h, w):
    print(f'--- {w}x{h} ---', flush=True)
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (h, w, 3), jnp.float32)
    vz = jnp.ones((h, w), jnp.float32)
    nrm = jnp.zeros((h, w, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((h, w, 3), jnp.float32)
    var = jax.random.uniform(key, (h, w), jnp.float32)
    hist = relax.RelaxHistory.create(h, w, jnp.float32)
    s = relax.RelaxSettings()
    pix = h * w

    bench('full relax.denoise', jax.jit(
        lambda hi, il: relax.denoise(hi, il, vz, nrm, mv, s)), hist, illum,
        pix=pix)
    bench('temporal_accumulate', jax.jit(
        lambda hi, il: relax.temporal_accumulate(hi, il, vz, nrm, mv, s)),
        hist, illum, pix=pix)
    bench('estimate_variance', jax.jit(
        lambda il, mo: relax.estimate_variance(il, mo, jnp.ones((h, w)))),
        illum, jnp.zeros((h, w, 2)), pix=pix)
    bench('anti_firefly', jax.jit(common.anti_firefly), illum, pix=pix)
    bench('atrous x1', jax.jit(
        lambda il, va: relax.atrous_iteration(il, va, vz, nrm, 1, s)),
        illum, var, pix=pix)

    def chain(il, va):
        for i in range(5):
            il, va = relax.atrous_iteration(il, va, vz, nrm, 1 << i, s)
        return il, va
    bench('atrous x5 chain', jax.jit(chain), illum, var, pix=pix)


def main():
    run(512, 512)
    run(1080, 1920)


if __name__ == '__main__':
    main()
