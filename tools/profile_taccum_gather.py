"""TPU probe: bilinear reproject gather variants at 512²x10ch."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np

H = W = 512
C = 10
key = jax.random.PRNGKey(0)
img = jax.random.uniform(key, (H, W, C), jnp.float32)
# small random motion
mv = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 2), jnp.float32) * 6 - 3
x = jnp.arange(W, dtype=jnp.float32) + 0.5
y = jnp.arange(H, dtype=jnp.float32) + 0.5
gx, gy = jnp.meshgrid(x, y)
pos = jnp.stack([gx, gy], axis=-1) + mv

def bench(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.3f} ms', flush=True)
    return out

from nrdsample_tpu.mathlib import filtering
bench('current sample_bilinear (2d-idx 4 gathers)', jax.jit(filtering.sample_bilinear), img, pos)

def flat4(img, pos):
    h, w, c = img.shape
    flatimg = img.reshape(h * w, c)
    p = pos - 0.5
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0
    x0 = jnp.clip(i0[..., 0], 0, w - 1)
    y0 = jnp.clip(i0[..., 1], 0, h - 1)
    x1 = jnp.clip(i0[..., 0] + 1, 0, w - 1)
    y1 = jnp.clip(i0[..., 1] + 1, 0, h - 1)
    fx, fy = f[..., 0:1], f[..., 1:2]
    c00 = flatimg[y0 * w + x0]
    c10 = flatimg[y0 * w + x1]
    c01 = flatimg[y1 * w + x0]
    c11 = flatimg[y1 * w + x1]
    return (c00 * (1-fx) * (1-fy) + c10 * fx * (1-fy)
            + c01 * (1-fx) * fy + c11 * fx * fy)
bench('flat-idx 4 gathers', jax.jit(flat4), img, pos)

def pair2(img, pos):
    h, w, c = img.shape
    # rows pack texel x and x+1: (H*W, 2C)
    shifted = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    pairs = jnp.concatenate([img, shifted], axis=-1).reshape(h * w, 2 * c)
    p = pos - 0.5
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0
    x0 = jnp.clip(i0[..., 0], 0, w - 1)
    y0 = jnp.clip(i0[..., 1], 0, h - 1)
    y1 = jnp.clip(i0[..., 1] + 1, 0, h - 1)
    fx, fy = f[..., 0:1], f[..., 1:2]
    top = pairs[y0 * w + x0]
    bot = pairs[y1 * w + x0]
    row_t = top[..., :c] * (1-fx) + top[..., c:] * fx
    row_b = bot[..., :c] * (1-fx) + bot[..., c:] * fx
    return row_t * (1-fy) + row_b * fy
out_p = bench('pair-packed 2 gathers', jax.jit(pair2), img, pos)

# parity check vs flat4
ref = jax.jit(flat4)(img, pos)
print('pair vs flat max err:', float(jnp.abs(out_p - ref).max()), flush=True)

# bounded-displacement stencil form (D=4): no gathers at all
def stencil(img, pos, D=4):
    h, w, c = img.shape
    p = pos - 0.5
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0
    xg = jnp.arange(w, dtype=jnp.int32)[None, :]
    yg = jnp.arange(h, dtype=jnp.int32)[:, None]
    dx = i0[..., 0] - xg  # in [-D, D-1] if bounded
    dy = i0[..., 1] - yg
    fx, fy = f[..., 0:1], f[..., 1:2]
    acc = jnp.zeros_like(img)
    for oy in range(-D, D):
        for ox in range(-D, D):
            wsel = ((dx == ox) & (dy == oy)).astype(img.dtype)[..., None]
            # 2x2 texels starting at (oy, ox) offset: shifted images
            def sh(a, ddy, ddx):
                a = jnp.roll(a, (-ddy, -ddx), axis=(0, 1))
                return a
            c00 = sh(img, oy, ox)
            c10 = sh(img, oy, ox + 1)
            c01 = sh(img, oy + 1, ox)
            c11 = sh(img, oy + 1, ox + 1)
            bil = (c00 * (1-fx) * (1-fy) + c10 * fx * (1-fy)
                   + c01 * (1-fx) * fy + c11 * fx * fy)
            acc = acc + bil * wsel
    return acc
bench('stencil D=4 (64 offsets, rolls)', jax.jit(stencil), img, pos)
