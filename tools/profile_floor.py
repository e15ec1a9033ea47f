"""TPU probe: packet-kernel cost floor decomposition.

Same grid/IO layout as the production kernel (block=128, pps=8), bodies of
increasing complexity:
  io      just copy tmax -> t_out (grid + DMA + IO floor)
  line1   1 straight-line cluster test per packet, no loops
  line2   2 straight-line cluster tests per packet
  loop0   the two production while loops with count forced to 0 (cond machinery)
  prod    production hoisted kernel
Run by absolute path on the axon TPU.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.ops.cluster import CLUSTER_SIZE, SLAB_ROWS
from nrdsample_tpu.ops.packet import (
    _mt_block, _ray_planes, _test_cluster, _merge_group, PACKETS_PER_STEP)
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

def make(variant):
    def kern(order_hbm, keys_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
             dz_ref, tmax_ref, slab_ref, t_out, tri_out, order_smem, dma_sem):
        c = keys_ref.shape[1]
        step = pl.program_id(0)
        dma = pltpu.make_async_copy(
            order_hbm.at[pl.ds(step * PACKETS_PER_STEP, PACKETS_PER_STEP), :],
            order_smem, dma_sem)
        dma.start()
        dma.wait()
        for p in range(PACKETS_PER_STEP):
            t0 = tmax_ref[p, :]
            tri0 = jnp.full(t0.shape, -1, jnp.int32)
            if variant == 'io':
                t_out[p, :] = t0
                tri_out[p, :] = tri0
            elif variant.startswith('line'):
                g = int(variant[4:])
                rays = _ray_planes(p, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref)
                best = (t0, tri0)
                for j in range(g):
                    cid_j = order_smem[p, jnp.minimum(jnp.int32(j), c - 1)]
                    t, u, v = _test_cluster(rays, slab_ref, cid_j, SLAB_ROWS)
                    cid_plane = jnp.broadcast_to(cid_j, t.shape)
                    best = _merge_group(t, cid_plane, best)
                t_out[p, :] = best[0]
                tri_out[p, :] = best[1]
            elif variant.startswith('sl'):
                g = int(variant[2:])
                rays = _ray_planes(p, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref)
                t0v = tmax_ref[p, :]
                t, cid_plane, u, v = packet._fold_tests(
                    rays, slab_ref, order_smem, p, jnp.int32(0), c, g,
                    SLAB_ROWS, False)
                best = packet._merge_group(t, cid_plane, packet._init_best(t0v, False))
                keys_row = keys_ref[p, :]
                def prune_count(t_best):
                    return jnp.sum((keys_row < jnp.max(t_best)).astype(jnp.int32))
                def cond(state):
                    return state[0] < state[-1]
                def body(state):
                    i, bst = state[0], state[1:-1]
                    pc_next = prune_count(bst[0])
                    t, cidp, u, v = packet._fold_tests(
                        rays, slab_ref, order_smem, p, i, c, 2, SLAB_ROWS, False)
                    return (i + 2,) + packet._merge_group(t, cidp, bst) + (pc_next,)
                st = jax.lax.while_loop(
                    cond, body, (jnp.int32(g),) + best + (prune_count(best[0]),))
                t_out[p, :] = st[1]
                tri_out[p, :] = st[2]
            elif variant == 'loop0':
                rays = _ray_planes(p, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref)
                def body(state):
                    i, t_best, tri_best, pc = state
                    t, u, v = _test_cluster(rays, slab_ref, order_smem[p, jnp.minimum(i, c-1)], SLAB_ROWS)
                    t_best2, tri_best2 = _merge_group(
                        t, jnp.broadcast_to(order_smem[p, 0], t.shape), (t_best, tri_best))
                    return i + 1, t_best2, tri_best2, pc
                def cond(state):
                    return state[0] < state[3]
                st = jax.lax.while_loop(cond, body, (jnp.int32(0), t0, tri0, jnp.int32(0)))
                st = jax.lax.while_loop(cond, body, st)
                t_out[p, :] = st[1]
                tri_out[p, :] = st[2]
    return kern

def run(variant):
    r = R
    origin, direction = o, d
    tm = jnp.full((r,), T_MAX, jnp.float32)
    nb = r // BLOCK
    order, keys_sorted, count = packet._block_worklists(origin, direction, cs, tm, BLOCK)
    cpad = (-cs.count) % 128
    if cpad:
        order = jnp.concatenate([order, jnp.zeros((nb, cpad), jnp.int32)], axis=1)
        keys_sorted = jnp.concatenate(
            [keys_sorted, jnp.full((nb, cpad), T_MAX, jnp.float32)], axis=1)
    o_c = [origin[:, k].reshape(nb, BLOCK) for k in range(3)]
    d_c = [direction[:, k].reshape(nb, BLOCK) for k in range(3)]
    tmb = tm.reshape(nb, BLOCK)
    c = cs.count + cpad
    pps = PACKETS_PER_STEP
    row_spec = pl.BlockSpec((pps, BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wl_spec = pl.BlockSpec((pps, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec(tuple(cs.slab.shape), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nb, BLOCK), jnp.float32),
                 jax.ShapeDtypeStruct((nb, BLOCK), jnp.int32)]
    f = pl.pallas_call(
        make(variant), grid=(nb // pps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), wl_spec,
                  *([row_spec] * 7), slab_spec],
        out_specs=[row_spec] * 2, out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((pps, c), jnp.int32), pltpu.SemaphoreType.DMA],
    )
    args = (order, keys_sorted, *o_c, *d_c, tmb, cs.slab)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    # VALIDATE against the production kernel
    ref = packet.closest_hit_packet(cs, o, d, block=BLOCK, hoist=True)
    tv = np.asarray(out[0]).reshape(-1)
    triv = np.asarray(out[1]).reshape(-1)
    tr = np.asarray(ref['t']); trir = np.asarray(ref['tri'])
    match = (np.abs(tv - tr) < 1e-4).mean()
    trimatch = (triv == trir).mean()
    print(f'{variant}: {dt*1e3:.2f} ms  ({dt/ (nb//pps) *1e6:.1f} us/step, '
          f'{dt/nb*1e6:.2f} us/packet)  t-match={match:.4f} tri-match={trimatch:.4f}', flush=True)

for v in ['io', 'line4', 'sl8', 'sl16', 'sl24', 'sl32', 'sl48', 'loop0']:
    run(v)

# production reference
fn = jax.jit(lambda o, d: packet.closest_hit_packet(cs, o, d, block=BLOCK, hoist=True))
outp = jax.block_until_ready(fn(o, d))
t0 = time.perf_counter()
for _ in range(8): outp = fn(o, d)
jax.block_until_ready(outp)
dt = (time.perf_counter()-t0)/8
print(f'prod(hoist): {dt*1e3:.2f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
