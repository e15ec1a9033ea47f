"""TPU: history-CYCLING timings (the production pattern). Hypothesis: the
570 ms 'poison' is per-call parameter relayout over the axon tunnel — extra
computed outputs change XLA's preferred parameter layouts, and a non-cycled
microbench feeds mismatched buffers every call. Cycling reaches steady state
after one call.

  c-t4   full relax.temporal_accumulate, hist cycled
  c-dn   full relax.denoise (taccum + variance + 5x atrous), hist cycled
  n-t4   same t4, hist NOT cycled (control, expect ~570 ms)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp

from nrdsample_tpu.denoise import relax

H = W = 512
s = relax.RelaxSettings()


def main():
    key = jax.random.PRNGKey(0)
    illum = jax.random.uniform(key, (H, W, 3), jnp.float32)
    vz = jnp.ones((H, W), jnp.float32)
    nrm = jnp.zeros((H, W, 3), jnp.float32).at[..., 2].set(1.0)
    mv = jnp.zeros((H, W, 3), jnp.float32)

    @jax.jit
    def t4(hist, il, vz, nrm, mv):
        return relax.temporal_accumulate(hist, il, vz, nrm, mv, s)

    @jax.jit
    def dn(hist, il, vz, nrm, mv):
        return relax.denoise(hist, il, vz, nrm, mv)

    # cycled t4
    hist = relax.RelaxHistory.create(H, W, jnp.float32)
    for _ in range(3):
        *_, hist = t4(hist, illum, vz, nrm, mv)
    jax.block_until_ready(hist)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        *_, hist = t4(hist, illum, vz, nrm, mv)
        jax.block_until_ready(hist)
        ts.append(time.perf_counter() - t0)
    print(f'c-t4 cycled taccum: {min(ts)*1e3:.2f} ms', flush=True)

    # cycled full denoise
    hist = relax.RelaxHistory.create(H, W, jnp.float32)
    for _ in range(3):
        out, hist = dn(hist, illum, vz, nrm, mv)
    jax.block_until_ready(out)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        out, hist = dn(hist, illum, vz, nrm, mv)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    mp = H * W / min(ts) / 1e6
    print(f'c-dn cycled full RELAX: {min(ts)*1e3:.2f} ms -> {mp:.1f} Mpix/s',
          flush=True)

    # non-cycled control
    hist0 = relax.RelaxHistory.create(H, W, jnp.float32)
    jax.block_until_ready(t4(hist0, illum, vz, nrm, mv))
    jax.block_until_ready(t4(hist0, illum, vz, nrm, mv))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(t4(hist0, illum, vz, nrm, mv))
        ts.append(time.perf_counter() - t0)
    print(f'n-t4 non-cycled taccum: {min(ts)*1e3:.2f} ms', flush=True)


if __name__ == '__main__':
    main()
