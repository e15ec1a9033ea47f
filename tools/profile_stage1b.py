"""TPU probe: stage 1 (worklist build+sort) vs production kernel split.

profile_floor.py showed trivial kernel bodies cost ~0.05 ms on precomputed
worklists while production is ~14.6 ms — implying stage 1 dominates. Confirm:
time _block_worklists alone, and the REAL production hoisted kernel on
precomputed stage-1 outputs. Run by absolute path on the axon TPU.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.ops.cluster import CLUSTER_SIZE, SLAB_ROWS
from nrdsample_tpu.ops.packet import _packet_kernel, PACKETS_PER_STEP
from nrdsample_tpu.ops.intersect import T_MAX
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
cs = ctx.clusters
W = H = 512
cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0, aspect=1.0)
pix = jnp.arange(W*H, dtype=jnp.int32)
o, d, _ = cam_mod.camera_rays(cam, W, H, pix, jnp.int32(0))
o = jax.block_until_ready(o)
R = W*H
BLOCK = 128

def bench(name, fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.3f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
    return out

tm = jnp.full((R,), T_MAX, jnp.float32)

# stage 1 alone
s1 = jax.jit(lambda o, d, tm: packet._block_worklists(o, d, cs, tm, BLOCK))
order, keys_sorted, count = bench('stage1 (entry+sort)', s1, o, d, tm)

# stage-1 sub-steps
from nrdsample_tpu.ops.cluster import _cluster_entry
ent = jax.jit(lambda o, d, tm: _cluster_entry(o, d, cs, tm))
bench('  entry matrix (R, C)', ent, o, d, tm)
def blockmin(o, d, tm):
    e = _cluster_entry(o, d, cs, tm)
    return jnp.min(e.reshape(R // BLOCK, BLOCK, cs.count), axis=1)
bench('  entry + block-min', jax.jit(blockmin), o, d, tm)
key0 = jax.block_until_ready(jax.jit(blockmin)(o, d, tm))
hit0 = key0 < T_MAX
bench('  packed sort only', jax.jit(lambda k, h: packet._sort_worklists(jnp.where(h, k, T_MAX), h)), key0, hit0)

# production kernel on precomputed stage-1 outputs
nb = R // BLOCK
cpad = (-cs.count) % 128
if cpad:
    order = jnp.concatenate([order, jnp.zeros((nb, cpad), jnp.int32)], axis=1)
    keys_sorted = jnp.concatenate(
        [keys_sorted, jnp.full((nb, cpad), T_MAX, jnp.float32)], axis=1)
o_c = [o[:, k].reshape(nb, BLOCK) for k in range(3)]
d_c = [d[:, k].reshape(nb, BLOCK) for k in range(3)]
tmb = tm.reshape(nb, BLOCK)
c = cs.count + cpad
pps = PACKETS_PER_STEP
row_spec = pl.BlockSpec((pps, BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM)
wl_spec = pl.BlockSpec((pps, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
slab_spec = pl.BlockSpec(tuple(cs.slab.shape), lambda i: (0, 0), memory_space=pltpu.VMEM)
out_shape = [jax.ShapeDtypeStruct((nb, BLOCK), jnp.float32),
             jax.ShapeDtypeStruct((nb, BLOCK), jnp.int32)]
kern = functools.partial(_packet_kernel, any_hit=False, hoist=True)
f = pl.pallas_call(
    kern, grid=(nb // pps,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), wl_spec,
              *([row_spec] * 7), slab_spec],
    out_specs=[row_spec] * 2, out_shape=out_shape,
    scratch_shapes=[pltpu.SMEM((pps, c), jnp.int32), pltpu.SemaphoreType.DMA],
)
out = bench('kernel only (hoist)', f, order, keys_sorted, *o_c, *d_c, tmb, cs.slab)

# full production for reference
fn = jax.jit(lambda o, d: packet.closest_hit_packet(cs, o, d, block=BLOCK, hoist=True))
bench('production e2e', fn, o, d)

# parity: kernel-only vs production
prod = jax.block_until_ready(fn(o, d))
tk = out[0].reshape(-1)[:R]
print('parity t:', bool(jnp.allclose(tk, prod['t'], atol=1e-3)), flush=True)
