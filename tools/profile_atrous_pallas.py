"""TPU probe (round 4): Pallas à-trous chain vs the XLA scan form at 1080p.

The RELAX image phase at kitchen1080 is ~980 ms (profile_kitchen r4); the
chain runs twice (diff+spec). Measures one 5-iteration chain on (1080,1920).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.denoise import relax, atrous_pallas


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
    h, w = 1080, 1920
    rs = np.random.RandomState(0)
    illum = jnp.asarray(rs.rand(h, w, 3).astype(np.float32))
    var = jnp.asarray(rs.rand(h, w).astype(np.float32) * 0.1)
    vz = jnp.asarray((1 + rs.rand(h, w) * 5).astype(np.float32))
    n = rs.randn(h, w, 3).astype(np.float32)
    n = n * 0.3 + np.array([0, 0, 1.0], np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n)
    s = relax.RelaxSettings()

    def xla_chain(il, va):
        out, v = il, va
        max_step = 1 << (s.atrous_iterations - 1)
        for i in range(s.atrous_iterations):
            out, v = relax.atrous_iteration(out, v, vz, n, 1 << i, s)
        return out

    def pl_chain(il, va):
        out, _ = atrous_pallas.atrous_chain(il, va, vz, n, s)
        return out

    a = bench('xla chain 1080p', jax.jit(xla_chain), illum, var)
    b = bench('pallas chain 1080p', jax.jit(pl_chain), illum, var)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f'max |diff| = {err:.2e}', flush=True)
    # single iterations at each step
    for st in (1, 8, 16):
        bench(f'pallas iter step={st}',
              jax.jit(lambda il, va, st=st: atrous_pallas.atrous_iteration_pallas(il, va, vz, n, st, s)[0]),
              illum, var)
        bench(f'xla    iter step={st}',
              jax.jit(lambda il, va, st=st: relax.atrous_iteration(il, va, vz, n, st, s)[0]),
              illum, var)


if __name__ == '__main__':
    main()
