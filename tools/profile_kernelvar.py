"""TPU experiment: packet-kernel loop-structure variants.

Ground truth for the optimization campaign: executed trip counts (pruning
included), and timings for loop variants x block sizes on the small scene.
Variants:
  B8/B4/B2 single-phase g-wide loop, vector prune cond (round-1 structure)
  A        two-phase 8-wide + 2-wide tail (current production)
  C        count-bound cond only (no dynamic t-pruning), two-phase
  T        trip-stats kernel: writes executed trip count per packet
Run by absolute path on the axon TPU.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.ops.cluster import CLUSTER_SIZE, SLAB_ROWS
from nrdsample_tpu.ops.packet import _mt_block, PACKETS_PER_STEP
from nrdsample_tpu.ops.intersect import T_MAX
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod


def make_kernel(variant, any_hit=False):
    def kern(order_hbm, keys_ref, counts_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
             slab_ref, t_out, tri_out, trips_out, order_smem, dma_sem):
        c = keys_ref.shape[1]
        step = pl.program_id(0)
        dma = pltpu.make_async_copy(
            order_hbm.at[pl.ds(step * PACKETS_PER_STEP, PACKETS_PER_STEP), :],
            order_smem, dma_sem)
        dma.start()
        dma.wait()
        for p in range(PACKETS_PER_STEP):
            one_packet(p, c, order_smem, keys_ref, counts_ref, ox_ref, oy_ref,
                       oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref, slab_ref,
                       t_out, tri_out, trips_out)

    def one_packet(p, c, order_smem, keys_ref, counts_ref, ox_ref, oy_ref,
                   oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref, slab_ref,
                   t_out, tri_out, trips_out):
        ox = ox_ref[p, :][:, None]; oy = oy_ref[p, :][:, None]
        oz = oz_ref[p, :][:, None]; dx = dx_ref[p, :][:, None]
        dy = dy_ref[p, :][:, None]; dz = dz_ref[p, :][:, None]
        t0 = tmax_ref[p, :]
        keys_row = keys_ref[p, :]
        init = (jnp.int32(0), t0, jnp.full(t0.shape, -1, jnp.int32),
                jnp.int32(0))

        def prune_count(t_best):
            return jnp.sum((keys_row < jnp.max(t_best)).astype(jnp.int32))

        def test(cid):
            blk = slab_ref[pl.ds(cid * SLAB_ROWS, SLAB_ROWS), :]
            t, u, v, hit = _mt_block(
                ox, oy, oz, dx, dy, dz,
                blk[0:1, :], blk[1:2, :], blk[2:3, :], blk[3:4, :],
                blk[4:5, :], blk[5:6, :], blk[6:7, :], blk[7:8, :], blk[8:9, :])
            return jnp.where(hit, t, T_MAX)

        def make_body(g):
            def body(state):
                i, t_best, tri_best, ntrip = state
                cid0 = order_smem[p, jnp.minimum(i, c - 1)]
                t = test(cid0)
                cid_plane = jnp.broadcast_to(cid0, t.shape)
                for j in range(1, g):
                    cid_j = order_smem[p, jnp.minimum(i + j, c - 1)]
                    t_j = test(cid_j)
                    take = t_j < t
                    cid_plane = jnp.where(take, cid_j, cid_plane)
                    t = jnp.where(take, t_j, t)
                t = jnp.where(t < t_best[:, None], t, T_MAX)
                k = t.shape[1]
                idxs = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                tmin = jnp.min(t, axis=-1)
                is_min = t <= tmin[:, None]
                kmin = jnp.min(jnp.where(is_min, idxs, k), axis=-1)
                sel = idxs == kmin[:, None]
                cid_win = jnp.max(jnp.where(sel, cid_plane, 0), axis=-1)
                closer = tmin < t_best
                t_best = jnp.where(closer, tmin, t_best)
                tri_best = jnp.where(closer, cid_win * CLUSTER_SIZE + kmin, tri_best)
                return i + g, t_best, tri_best, ntrip + 1
            return body

        if variant.startswith('B'):
            g = int(variant[1:])
            def cond(s):
                i, t_best, _, _ = s
                return i < prune_count(t_best)
            state = jax.lax.while_loop(cond, make_body(g), init)
        elif variant == 'A' or variant == 'T':
            def cond_main(s):
                i, t_best, _, _ = s
                return i + 8 <= prune_count(t_best)
            def cond_tail(s):
                i, t_best, _, _ = s
                return i < prune_count(t_best)
            state = jax.lax.while_loop(cond_main, make_body(8), init)
            state = jax.lax.while_loop(cond_tail, make_body(2), state)
        elif variant == 'C':
            cnt = counts_ref[p, 0]
            def cond_main(s):
                return s[0] + 8 <= cnt
            def cond_tail(s):
                return s[0] < cnt
            state = jax.lax.while_loop(cond_main, make_body(8), init)
            state = jax.lax.while_loop(cond_tail, make_body(2), state)
        _, t_best, tri_best, ntrip = state
        t_out[p, :] = t_best
        tri_out[p, :] = tri_best
        trips_out[p, :] = jnp.broadcast_to(ntrip, t_best.shape)

    return kern


def run_variant(variant, cs, order, keys, counts, o_c, d_c, tmb, block, n=5):
    nb = tmb.shape[0]
    c = keys.shape[1]
    pps = PACKETS_PER_STEP
    row_spec = pl.BlockSpec((pps, block), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wl_spec = pl.BlockSpec((pps, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((pps, 128), lambda i: (i, 0), memory_space=pltpu.SMEM)
    slab_spec = pl.BlockSpec(tuple(cs.slab.shape), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nb, block), jnp.float32),
                 jax.ShapeDtypeStruct((nb, block), jnp.int32),
                 jax.ShapeDtypeStruct((nb, block), jnp.int32)]
    fn = jax.jit(lambda order, keys, counts, *rest: pl.pallas_call(
        make_kernel(variant), grid=(nb // pps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), wl_spec, cnt_spec,
                  *([row_spec] * 7), slab_spec],
        out_specs=[row_spec] * 3, out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((pps, c), jnp.int32), pltpu.SemaphoreType.DMA],
    )(order, keys, counts, *rest))
    args = (order, keys, counts, *o_c, *d_c, tmb)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    r = nb * block
    trips = np.asarray(out[2])[:, 0]
    print(f'{variant} block={block}: {dt*1e3:.2f} ms -> {r/dt/1e6:.2f} Mrays/s '
          f'(exec trips: mean={trips.mean():.2f} sum={trips.sum()})', flush=True)
    return out


def main():
    scene = procedural.shader_balls(grid=3, sphere_res=24)
    ctx, scene = traversal.build_context(scene)
    cs = ctx.clusters
    cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0)
    pix = jnp.arange(512 * 512, dtype=jnp.int32)
    o, d, _ = cam_mod.camera_rays(cam, 512, 512, pix, jnp.int32(0))
    o, d = jax.block_until_ready(o), jax.block_until_ready(d)
    r = o.shape[0]
    tm = jnp.full((r,), T_MAX, jnp.float32)

    ref = None
    for block in (256, 128):
        nb = r // block
        order, keys, count = jax.jit(
            lambda o, d, tm: packet._block_worklists(o, d, cs, tm, block))(o, d, tm)
        cpad = (-cs.count) % 128
        order = jnp.concatenate([order, jnp.zeros((nb, cpad), jnp.int32)], axis=1)
        keys = jnp.concatenate(
            [keys, jnp.full((nb, cpad), jnp.inf, jnp.float32)], axis=1)
        counts = jnp.broadcast_to(count[:, None], (nb, 128))
        o_c = [o[:, k].reshape(nb, block) for k in range(3)]
        d_c = [d[:, k].reshape(nb, block) for k in range(3)]
        tmb = tm.reshape(nb, block)
        print(f'--- block={block}: count mean={np.asarray(count).mean():.1f} ---',
              flush=True)
        for variant in ('B8', 'B4', 'B2', 'A', 'C'):
            out = run_variant(variant, cs, order, keys, counts, o_c, d_c, tmb, block)
            t_flat = np.asarray(out[0]).reshape(-1)
            if ref is None:
                ref = t_flat
            elif block == 256:
                print(f'   parity max|dt|={np.abs(t_flat-ref).max():.2e}', flush=True)


if __name__ == '__main__':
    main()
