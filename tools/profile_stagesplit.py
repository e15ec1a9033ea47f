"""TPU probe: where does a 262k-ray packet launch spend its time?

Splits closest_hit_packet into: stage1 (worklist build+sort), sort-gather
(morton re-bin), kernel (pallas), uv-reconstruct. Run by absolute path on axon.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
cs = ctx.clusters
print('clusters', cs.count, 'slab', cs.slab.shape, flush=True)

W = H = 512
cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0, aspect=1.0)
pix = jnp.arange(W*H, dtype=jnp.int32)
o, d, _ = cam_mod.camera_rays(cam, W, H, pix, jnp.int32(0))
o = jax.block_until_ready(o); R = W*H
tm = jnp.full((R,), 1e5, jnp.float32)

def bench(name, fn, *args, n=16):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.3f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
    return out

BLOCK = 128

# full launch
f_full = jax.jit(lambda o, d: packet.closest_hit_packet(cs, o, d, block=BLOCK, hoist=True))
bench('full primary', f_full, o, d)

# stage 1 only
f_s1 = jax.jit(lambda o, d: packet._block_worklists(o, d, cs, tm, BLOCK))
order, keys, cnt = bench('stage1 worklists', f_s1, o, d)
c = np.asarray(cnt)
print(f'  worklist mean {c.mean():.2f} p50 {np.percentile(c,50):.0f} '
      f'p90 {np.percentile(c,90):.0f} max {c.max()}', flush=True)

# stage1 split: entry matrix+reduce vs sort
f_entry = jax.jit(lambda o, d: packet._cluster_entry(o, d, cs, tm).min(axis=0))
try:
    bench('  entry-matrix (fused reduce)', f_entry, o, d)
except Exception as e:
    print('  entry-matrix probe failed:', e, flush=True)

def s1_sortonly(key, hit):
    return packet._sort_worklists(key, hit)
from nrdsample_tpu.ops.cluster import _cluster_entry
def keys_fn(o, d):
    entry = _cluster_entry(o, d, cs, tm)
    eb = entry.reshape(R // BLOCK, BLOCK, cs.count)
    bn = jnp.min(eb, axis=1)
    return jnp.where(bn < packet.T_MAX, bn, packet.T_MAX), bn < packet.T_MAX
f_keys = jax.jit(keys_fn)
key, hit = bench('  block keys (entry+reduce)', f_keys, o, d)
f_sort = jax.jit(s1_sortonly)
bench('  sort only', f_sort, key, hit)

# kernel only (worklists precomputed as inputs)
def kernel_only(order, keys, o, d):
    # replicate the tail of closest_hit_packet without stage 1
    nb = R // BLOCK
    cpad = (-cs.count) % 128
    if cpad:
        order = jnp.concatenate([order, jnp.zeros((nb, cpad), jnp.int32)], axis=1)
        keys = jnp.concatenate([keys, jnp.full((nb, cpad), packet.T_MAX, jnp.float32)], axis=1)
    return order, keys
order_p, keys_p = jax.jit(kernel_only)(order, keys, o, d)

import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nrdsample_tpu.ops.cluster import SLAB_ROWS, CLUSTER_SIZE

def run_kernel(order, keys, o, d, tmv):
    nb = R // BLOCK
    pps = packet.PACKETS_PER_STEP
    cc = order.shape[1]
    o_c = [o[:, k].reshape(nb, BLOCK) for k in range(3)]
    d_c = [d[:, k].reshape(nb, BLOCK) for k in range(3)]
    tmb = tmv.reshape(nb, BLOCK)
    row_spec = pl.BlockSpec((pps, BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wl_spec = pl.BlockSpec((pps, cc), lambda i: (i, 0), memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec(tuple(cs.slab.shape), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(packet._packet_kernel, any_hit=False,
                               interleave=1, prologue=0, hoist=True)
    t, tri = pl.pallas_call(
        kernel,
        grid=(nb // pps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), wl_spec,
                  *([row_spec] * 7), slab_spec],
        out_specs=[row_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((nb, BLOCK), jnp.float32),
                   jax.ShapeDtypeStruct((nb, BLOCK), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((pps, cc), jnp.int32), pltpu.SemaphoreType.DMA],
    )(order, keys, *o_c, *d_c, tmb, cs.slab)
    return t, tri

f_k = jax.jit(run_kernel)
bench('kernel only', f_k, order_p, keys_p, o, d, tm)

# uv reconstruct
res = f_full(o, d)
def uvrec(tri, o, d):
    from nrdsample_tpu.ops import intersect as isect
    safe = jnp.maximum(tri, 0)
    p0 = cs.p0_b.reshape(-1, 3)[safe]
    e1 = cs.e1_b.reshape(-1, 3)[safe]
    e2 = cs.e2_b.reshape(-1, 3)[safe]
    return isect._mt_intersect(o, d, p0, e1, e2)
f_uv = jax.jit(uvrec)
bench('uv reconstruct', f_uv, res['tri'], o, d)
