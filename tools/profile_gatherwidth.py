"""TPU probe: row-gather throughput vs row width (decode_hit layout question).

Is ONE (R, 32) gather faster than ten (R, 3) gathers from a (T, 3) table?
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np

R = 512 * 512
T = 13312
rs = np.random.RandomState(0)
idx = jnp.asarray(rs.randint(0, T, R), jnp.int32)
idx_sorted = jnp.sort(idx)

def bench(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.3f} ms', flush=True)

tabs3 = [jnp.asarray(rs.rand(T, 3), jnp.float32) for _ in range(10)]
tab30 = jnp.concatenate(tabs3, axis=1)  # (T, 30)
tab32 = jnp.concatenate([tab30, jnp.zeros((T, 2), jnp.float32)], axis=1)

f_ten = jax.jit(lambda i: [t[i] for t in tabs3])
bench('10x (R,3) gathers', f_ten, idx)
f_one30 = jax.jit(lambda i: tab30[i])
bench('1x (R,30) gather', f_one30, idx)
f_one32 = jax.jit(lambda i: tab32[i])
bench('1x (R,32) gather', f_one32, idx)
bench('1x (R,32) gather sorted-idx', f_one32, idx_sorted)

# concat-then-gather inside one jit (what decode would do)
f_cat = jax.jit(lambda i: jnp.concatenate(tabs3, axis=1)[i])
bench('concat+1x(R,30) gather', f_cat, idx)

# take_along_axis form
f_ta = jax.jit(lambda i: jnp.take(tab32, i, axis=0))
bench('take (R,32)', f_ta, idx)

# one-hot matmul alternative: (R,T)@(T,32) is too big, but segment trick:
# skip. Instead measure small-table gathers (materials):
M = 8
mat_tab = jnp.asarray(rs.rand(M, 9), jnp.float32)
mid = jnp.asarray(rs.randint(0, M, R), jnp.int32)
f_m = jax.jit(lambda i: mat_tab[i])
bench('1x (R,9) small-table gather', f_m, mid)
# one-hot matmul for small table
f_oh = jax.jit(lambda i: jax.nn.one_hot(i, M, dtype=jnp.float32) @ mat_tab)
bench('one-hot matmul (R,8)@(8,9)', f_oh, mid)
