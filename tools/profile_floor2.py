"""TPU probe: validate the straight-line-is-free result from profile_floor.py.

line-K variants now (a) verify OUTPUT parity against production on packets
whose worklist count <= K, (b) time with n=50, (c) add a K=16 point and a
'prefix + fused per-step residual loop' prototype (the candidate production
structure). Run by absolute path on the axon TPU.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.ops.cluster import CLUSTER_SIZE, SLAB_ROWS
from nrdsample_tpu.ops.packet import (
    _ray_planes, _test_cluster, _merge_group, PACKETS_PER_STEP)
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

tm = jnp.full((R,), T_MAX, jnp.float32)
s1 = jax.jit(lambda o, d, tm: packet._block_worklists(o, d, cs, tm, BLOCK))
order, keys_sorted, count = jax.block_until_ready(s1(o, d, tm))
cnt = np.asarray(count)
print('worklist count: mean %.2f p50 %d p90 %d p99 %d max %d' % (
    cnt.mean(), np.percentile(cnt, 50), np.percentile(cnt, 90),
    np.percentile(cnt, 99), cnt.max()), flush=True)

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
args = (order, keys_sorted, *o_c, *d_c, tmb, cs.slab)


def lineK(K, fused_residual=False, g=2):
    def kern(order_hbm, keys_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
             dz_ref, tmax_ref, slab_ref, t_out, tri_out, order_smem, dma_sem):
        cc = keys_ref.shape[1]
        step = pl.program_id(0)
        dma = pltpu.make_async_copy(
            order_hbm.at[pl.ds(step * pps, pps), :], order_smem, dma_sem)
        dma.start()
        dma.wait()
        states = []
        for p in range(pps):
            rays = _ray_planes(p, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref)
            t0 = tmax_ref[p, :]
            cid0 = order_smem[p, 0]
            t = _test_cluster(rays, slab_ref, cid0, SLAB_ROWS)
            cid_plane = jnp.broadcast_to(cid0, t.shape)
            for j in range(1, K):
                cid_j = order_smem[p, jnp.minimum(jnp.int32(j), cc - 1)]
                t_j = _test_cluster(rays, slab_ref, cid_j, SLAB_ROWS)
                take = t_j < t
                cid_plane = jnp.where(take, cid_j, cid_plane)
                t = jnp.where(take, t_j, t)
            t_best, tri_best = _merge_group(
                t, cid_plane, t0, jnp.full(t0.shape, -1, jnp.int32))
            states.append((t_best, tri_best))
        if fused_residual:
            # ONE while loop per grid step continuing all 8 packets from i=K
            keys = [keys_ref[p, :] for p in range(pps)]
            rays_all = [
                _ray_planes(p, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref)
                for p in range(pps)]
            init = ((jnp.int32(K),)
                    + tuple(s[0] for s in states)
                    + tuple(s[1] for s in states))

            def cond(state):
                i = state[0]
                pc = jnp.int32(0)
                for k in range(pps):
                    pck = jnp.sum((keys[k] < jnp.max(state[1 + k])).astype(jnp.int32))
                    pc = jnp.maximum(pc, pck)
                return i < pc

            def body(state):
                i = state[0]
                out = []
                outtri = []
                for k in range(pps):
                    t_best, tri_best = state[1 + k], state[1 + pps + k]
                    cid0 = order_smem[k, jnp.minimum(i, cc - 1)]
                    t = _test_cluster(rays_all[k], slab_ref, cid0, SLAB_ROWS)
                    cid_plane = jnp.broadcast_to(cid0, t.shape)
                    for j in range(1, g):
                        cid_j = order_smem[k, jnp.minimum(i + j, cc - 1)]
                        t_j = _test_cluster(rays_all[k], slab_ref, cid_j, SLAB_ROWS)
                        take = t_j < t
                        cid_plane = jnp.where(take, cid_j, cid_plane)
                        t = jnp.where(take, t_j, t)
                    t_best, tri_best = _merge_group(t, cid_plane, t_best, tri_best)
                    out.append(t_best)
                    outtri.append(tri_best)
                return (i + g,) + tuple(out) + tuple(outtri)

            st = jax.lax.while_loop(cond, body, init)
            states = [(st[1 + k], st[1 + pps + k]) for k in range(pps)]
        for p in range(pps):
            t_out[p, :] = states[p][0]
            tri_out[p, :] = states[p][1]
    return kern


def bench(name, kern, n=50):
    f = pl.pallas_call(
        kern, grid=(nb // pps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), wl_spec,
                  *([row_spec] * 7), slab_spec],
        out_specs=[row_spec] * 2, out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((pps, c), jnp.int32), pltpu.SemaphoreType.DMA],
    )
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.3f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
    return out

prod = jax.block_until_ready(jax.jit(
    lambda o, d: packet.closest_hit_packet(cs, o, d, block=BLOCK, hoist=True))(o, d))

for K in [4, 8, 16]:
    out = bench(f'line{K}', lineK(K))
    # parity on packets whose count <= K (others legitimately differ)
    tk = np.asarray(out[0]).reshape(-1)
    ok_rows = np.repeat(cnt <= K, BLOCK)
    pt = np.asarray(prod['t'])
    match = np.isclose(tk[ok_rows], pt[ok_rows], atol=1e-3).mean()
    print(f'  parity on count<={K} packets ({ok_rows.mean():.3f} of rays): {match:.4f}', flush=True)

out = bench('prefix8 + fused residual g2', lineK(8, fused_residual=True))
tk = np.asarray(out[0]).reshape(-1)
match = np.isclose(tk, np.asarray(prod['t']), atol=1e-3).mean()
print(f'  FULL parity: {match:.4f}', flush=True)
out = bench('prefix4 + fused residual g2', lineK(4, fused_residual=True))
tk = np.asarray(out[0]).reshape(-1)
match = np.isclose(tk, np.asarray(prod['t']), atol=1e-3).mean()
print(f'  FULL parity: {match:.4f}', flush=True)
