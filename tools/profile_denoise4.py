"""TPU profile: RELAX stack breakdown with ALL planes as jit ARGUMENTS
(closure-captured arrays become HLO constants that axon re-uploads per call,
poisoning timings — see bench.py bench_denoise notes).

Run by absolute path on axon: python /root/repo/tools/profile_denoise4.py
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import relax, common


def bench(name, fn, *args, n=20, pix=None):
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(*args))
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

    bench('full relax.denoise',
          lambda hi, il, vz, nrm, mv: relax.denoise(hi, il, vz, nrm, mv, s),
          hist, illum, vz, nrm, mv, pix=pix)
    bench('temporal_accumulate',
          lambda hi, il, vz, nrm, mv: relax.temporal_accumulate(
              hi, il, vz, nrm, mv, s),
          hist, illum, vz, nrm, mv, pix=pix)
    bench('anti_firefly', lambda il: common.anti_firefly(il), illum, pix=pix)
    bench('atrous x1',
          lambda il, va, vz, nrm: relax.atrous_iteration(il, va, vz, nrm, 1, s),
          illum, var, vz, nrm, pix=pix)

    def chain(il, va, vz, nrm):
        for i in range(5):
            il, va = relax.atrous_iteration(il, va, vz, nrm, 1 << i, s)
        return il, va
    bench('atrous x5 chain', chain, illum, var, vz, nrm, pix=pix)

    bench('reproject (bilinear)',
          lambda img, mv: common.reproject(img, mv),
          illum, mv, pix=pix)


def main():
    run(512, 512)
    run(1080, 1920)


if __name__ == '__main__':
    main()
