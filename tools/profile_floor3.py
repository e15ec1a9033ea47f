"""TPU probe: production-loop restructure candidates on precomputed worklists.

  line0/line1/line8/line16  fixed-vs-marginal cost decomposition
  mergefree  two-phase walk, merges deferred: trips carry a running
             (t_plane, cid_plane) pair (2 extra ops per test) and the argmin
             runs ONCE per packet; prune bound from row-min of the plane.
  mf+bf16    same with bf16 slab + rays (f32 t refinement outside the kernel
             already exists in production: isect re-test of the winner).
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
UNROLL = 8
TAIL = 2

tm = jnp.full((R,), T_MAX, jnp.float32)
s1 = jax.jit(lambda o, d, tm: packet._block_worklists(o, d, cs, tm, BLOCK))
order, keys_sorted, count = jax.block_until_ready(s1(o, d, tm))
cnt = np.asarray(count)

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
slab_bf16 = cs.slab.astype(jnp.bfloat16)


def make_kern(variant, ray_dtype=jnp.float32, slab_is_bf16=False):
    def kern(order_hbm, keys_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
             dz_ref, tmax_ref, slab_ref, t_out, tri_out, order_smem, dma_sem):
        cc = keys_ref.shape[1]
        step = pl.program_id(0)
        dma = pltpu.make_async_copy(
            order_hbm.at[pl.ds(step * pps, pps), :], order_smem, dma_sem)
        dma.start()
        dma.wait()
        big = jnp.asarray(T_MAX, ray_dtype)
        for p in range(pps):
            rays = _ray_planes(p, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref)
            if ray_dtype != jnp.float32:
                rays = tuple(r.astype(ray_dtype) for r in rays)
            t0 = tmax_ref[p, :]
            keys_row = keys_ref[p, :]

            def test(cid):
                blk = slab_ref[pl.ds(cid * SLAB_ROWS, SLAB_ROWS), :]
                if slab_is_bf16 and ray_dtype == jnp.float32:
                    blk = blk.astype(jnp.float32)
                t, u, v, hit = _mt_block(
                    *rays,
                    blk[0:1, :], blk[1:2, :], blk[2:3, :],
                    blk[3:4, :], blk[4:5, :], blk[5:6, :],
                    blk[6:7, :], blk[7:8, :], blk[8:9, :])
                return jnp.where(hit, t, big)

            if variant.startswith('line'):
                K = int(variant[4:])
                tri0 = jnp.full(t0.shape, -1, jnp.int32)
                if K == 0:
                    t_out[p, :] = t0
                    tri_out[p, :] = tri0
                    continue
                cid0 = order_smem[p, 0]
                t = test(cid0)
                cid_plane = jnp.broadcast_to(cid0, t.shape)
                for j in range(1, K):
                    cid_j = order_smem[p, jnp.minimum(jnp.int32(j), cc - 1)]
                    t_j = test(cid_j)
                    take = t_j < t
                    cid_plane = jnp.where(take, cid_j, cid_plane)
                    t = jnp.where(take, t_j, t)
                t_best, tri_best = _merge_group(
                    t.astype(jnp.float32), cid_plane, t0,
                    jnp.full(t0.shape, -1, jnp.int32))
                t_out[p, :] = t_best
                tri_out[p, :] = tri_best
            elif variant == 'mergefree':
                # running (t_plane, cid_plane); prune bound from row-min,
                # computed in the body (hoisted; one trip conservative)
                t_plane0 = jnp.full((BLOCK, CLUSTER_SIZE), big, ray_dtype)
                cid_plane0 = jnp.zeros((BLOCK, CLUSTER_SIZE), jnp.int32)

                def pc_of(t_plane):
                    tb = jnp.minimum(jnp.min(t_plane, axis=-1).astype(jnp.float32), t0)
                    return jnp.sum((keys_row < jnp.max(tb)).astype(jnp.int32))

                def make_body(g):
                    def body(state):
                        i, t_plane, cid_plane, _ = state
                        pc_next = pc_of(t_plane)
                        for j in range(g):
                            cid_j = order_smem[p, jnp.minimum(i + j, cc - 1)]
                            t_j = test(cid_j)
                            take = t_j < t_plane
                            cid_plane = jnp.where(take, cid_j, cid_plane)
                            t_plane = jnp.where(take, t_j, t_plane)
                        return i + g, t_plane, cid_plane, pc_next
                    return body

                init = (jnp.int32(0), t_plane0, cid_plane0, pc_of(t_plane0))
                st = jax.lax.while_loop(
                    lambda s: s[0] + UNROLL <= s[3], make_body(UNROLL), init)
                st = jax.lax.while_loop(
                    lambda s: s[0] < s[3], make_body(TAIL), st)
                _, t_plane, cid_plane, _ = st
                t_best, tri_best = _merge_group(
                    t_plane.astype(jnp.float32), cid_plane, t0,
                    jnp.full(t0.shape, -1, jnp.int32))
                t_out[p, :] = t_best
                tri_out[p, :] = tri_best
    return kern


row_spec = pl.BlockSpec((pps, BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM)
wl_spec = pl.BlockSpec((pps, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
out_shape = [jax.ShapeDtypeStruct((nb, BLOCK), jnp.float32),
             jax.ShapeDtypeStruct((nb, BLOCK), jnp.int32)]


def bench(name, variant, ray_dtype=jnp.float32, use_bf16_slab=False, n=30):
    slab = slab_bf16 if use_bf16_slab else cs.slab
    slab_spec = pl.BlockSpec(tuple(slab.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        make_kern(variant, ray_dtype, use_bf16_slab), grid=(nb // pps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), wl_spec,
                  *([row_spec] * 7), slab_spec],
        out_specs=[row_spec] * 2, out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((pps, c), jnp.int32), pltpu.SemaphoreType.DMA],
    )
    args = (order, keys_sorted, *o_c, *d_c, tmb, slab)
    out = f(*args)
    np.asarray(out[0])  # force (block_until_ready unreliable on axon eager)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    s = np.asarray(out[0]).sum()  # force
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.3f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
    return out

prod = jax.block_until_ready(jax.jit(
    lambda o, d: packet.closest_hit_packet(cs, o, d, block=BLOCK, hoist=True))(o, d))
pt = np.asarray(prod['t'])

for name, v, dt_, bf in [
    ('line0 (fixed cost)', 'line0', jnp.float32, False),
    ('line1', 'line1', jnp.float32, False),
    ('line8', 'line8', jnp.float32, False),
    ('line16', 'line16', jnp.float32, False),
    ('line8 bf16', 'line8', jnp.bfloat16, True),
    ('line16 bf16', 'line16', jnp.bfloat16, True),
    ('mergefree', 'mergefree', jnp.float32, False),
    ('mergefree bf16', 'mergefree', jnp.bfloat16, True),
]:
    out = bench(name, v, dt_, bf)
    if v == 'mergefree':
        tk = np.asarray(out[0]).reshape(-1)
        atol = 1e-3 if dt_ == jnp.float32 else 3e-2
        match = np.isclose(tk, pt, atol=atol, rtol=1e-2).mean()
        print(f'  FULL parity (atol={atol}): {match:.4f}', flush=True)
