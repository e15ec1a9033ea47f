"""Dump HLO for the g4 footprint gather (arg indices) that measured 0.05 ms,
and the same gather with inline-computed indices; diff the compiled form."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import re, time, jax, jax.numpy as jnp

H = W = 512
C = 10


def main():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W, C), jnp.float32)
    mv = 20.0 * jnp.sin(
        jnp.stack(jnp.meshgrid(jnp.linspace(0, 6, W), jnp.linspace(0, 6, H)),
                  axis=-1))
    pos = (jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                                  jnp.arange(H, dtype=jnp.float32)), axis=-1)
           + 0.5 + mv)
    i0 = jnp.floor(pos - 0.5).astype(jnp.int32)
    ix = jnp.clip(i0[..., 0], 0, W - 1)
    iy = jnp.clip(i0[..., 1], 0, H - 1)

    def g4_args(im, ix, iy):
        idx = jnp.stack([iy.reshape(-1), ix.reshape(-1)], axis=-1)
        return jax.lax.gather(
            im, idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(2, 2, C), mode='clip')

    def g4_inline(im, mv):
        pos = (jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                                      jnp.arange(H, dtype=jnp.float32)),
                         axis=-1) + 0.5 + mv)
        i0 = jnp.floor(pos - 0.5).astype(jnp.int32)
        ix = jnp.clip(i0[..., 0], 0, W - 1)
        iy = jnp.clip(i0[..., 1], 0, H - 1)
        idx = jnp.stack([iy.reshape(-1), ix.reshape(-1)], axis=-1)
        return jax.lax.gather(
            im, idx,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(2, 2, C), mode='clip')

    for name, fn, args in (("args", g4_args, (img, ix, iy)),
                           ("inline", g4_inline, (img, mv))):
        jfn = jax.jit(fn)
        txt = jfn.lower(*args).compile().as_text()
        has_while = "while(" in txt
        n_gather = len(re.findall(r'= \S+ gather\(', txt))
        print(f"{name}: while={has_while} gather_ops={n_gather}", flush=True)
        jax.block_until_ready(jfn(*args))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(jfn(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.2f} ms", flush=True)
        with open(f"/tmp/hlo_g4_{name}.txt", "w") as f:
            f.write(txt)


if __name__ == "__main__":
    main()
