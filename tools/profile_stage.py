"""TPU profile: packet-traversal stage breakdown.

Times stage 1 (worklist construction incl. argsort) separately from the
Pallas kernel, and reports worklist-count statistics so per-trip kernel
latency can be derived. Run by absolute path on the axon TPU.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.ops.intersect import T_MAX
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod

BLOCK = 256


def bench(name, fn, *args, n=5, rays=None):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    msg = f'{name}: {dt*1e3:.2f} ms'
    if rays:
        msg += f' -> {rays/dt/1e6:.2f} Mrays/s'
    print(msg, flush=True)
    return out, dt


def stage1_fn(cs, block):
    if cs.count <= 2048:
        f = functools.partial(packet._block_worklists, cs=cs, block=block)
    else:
        f = functools.partial(packet._block_worklists_super, cs=cs, block=block)
    return jax.jit(lambda o, d, tm: f(o, d, t_max=tm))


def profile_scene(tag, cs, o, d, stream):
    r = o.shape[0]
    tm = jnp.full((r,), T_MAX, jnp.float32)
    s1 = stage1_fn(cs, BLOCK)
    (order, keys, count), dt1 = bench(f'{tag} stage1', s1, o, d, tm)
    cnt = np.asarray(count)
    print(f'  worklist count: mean={cnt.mean():.1f} p50={np.percentile(cnt,50):.0f} '
          f'p90={np.percentile(cnt,90):.0f} max={cnt.max()}', flush=True)

    full = jax.jit(lambda o, d: packet.closest_hit_packet(
        cs, o, d, block=BLOCK, stream=stream))
    _, dtf = bench(f'{tag} full', full, o, d, rays=r)

    # kernel-only: pass precomputed worklists through a closure
    kern = jax.jit(lambda o, d, tm, order, keys: _kernel_only(
        cs, o, d, tm, order, keys, stream))
    res, dtk = bench(f'{tag} kernel-only', kern, o, d, tm, order, keys, rays=r)
    # estimated trips: sum over packets of counts rounded up to UNROLL
    trips = np.ceil(cnt / packet.UNROLL).sum()
    print(f'  stage1 {dt1*1e3:.2f} ms + kernel {dtk*1e3:.2f} ms '
          f'(full {dtf*1e3:.2f}); trips={trips:.0f} -> {dtk/trips*1e9:.0f} ns/trip',
          flush=True)
    # postproc (u/v reconstruction) = full - stage1 - kernel
    return res


def _kernel_only(cs, origin, direction, tm, order, keys_sorted, stream):
    """The pallas_call slice of closest_hit_packet (padding assumed done)."""
    from nrdsample_tpu.ops.cluster import SLAB_ROWS, CLUSTER_SIZE
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    r = origin.shape[0]
    nb = r // BLOCK
    cpad = (-cs.count) % 128
    if cpad:
        order = jnp.concatenate([order, jnp.zeros((nb, cpad), jnp.int32)], axis=1)
        keys_sorted = jnp.concatenate(
            [keys_sorted, jnp.full((nb, cpad), T_MAX, jnp.float32)], axis=1)
    o_c = [origin[:, k].reshape(nb, BLOCK) for k in range(3)]
    d_c = [direction[:, k].reshape(nb, BLOCK) for k in range(3)]
    tmb = tm.reshape(nb, BLOCK)
    c = cs.count + cpad
    pps = packet.PACKETS_PER_STEP
    row_spec = pl.BlockSpec((pps, BLOCK), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wl_spec = pl.BlockSpec((pps, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nb, BLOCK), jnp.float32),
                 jax.ShapeDtypeStruct((nb, BLOCK), jnp.int32)]
    if stream:
        kernel = functools.partial(packet._packet_kernel_stream, any_hit=False)
        t, tri = pl.pallas_call(
            kernel, grid=(nb // pps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), wl_spec,
                      *([row_spec] * 7), pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[row_spec] * 2, out_shape=out_shape,
            scratch_shapes=[
                pltpu.SMEM((pps, c), jnp.int32), pltpu.SemaphoreType.DMA,
                pltpu.VMEM((2 * packet.UNROLL * SLAB_ROWS, CLUSTER_SIZE), jnp.float32),
                pltpu.SemaphoreType.DMA((2, packet.UNROLL)),
            ],
        )(order, keys_sorted, *o_c, *d_c, tmb, cs.slab)
    else:
        slab_spec = pl.BlockSpec(tuple(cs.slab.shape), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
        kernel = functools.partial(packet._packet_kernel, any_hit=False)
        t, tri = pl.pallas_call(
            kernel, grid=(nb // pps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), wl_spec,
                      *([row_spec] * 7), slab_spec],
            out_specs=[row_spec] * 2, out_shape=out_shape,
            scratch_shapes=[pltpu.SMEM((pps, c), jnp.int32),
                            pltpu.SemaphoreType.DMA],
        )(order, keys_sorted, *o_c, *d_c, tmb, cs.slab)
    return t, tri


def main():
    scene = procedural.shader_balls(grid=3, sphere_res=24)
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0)
    pix = jnp.arange(512 * 512, dtype=jnp.int32)
    o, d, _ = cam_mod.camera_rays(cam, 512, 512, pix, jnp.int32(0))
    o, d = jax.block_until_ready(o), jax.block_until_ready(d)
    print(f'small: {scene.num_tris} tris, {ctx.clusters.count} clusters', flush=True)
    profile_scene('small resident', ctx.clusters, o, d, stream=False)
    profile_scene('small stream', ctx.clusters, o, d, stream=True)

    scene_b = procedural.exterior(cobbles=120, tree_count=450, tree_res=28,
                                  glass=False)
    ctx_b, scene_b = traversal.build_context(scene_b, mode='cluster')
    cam_b = look_at(eye=[0.0, -45.0, 6.0], target=[0.0, 0.0, 4.0], fov_y_deg=55.0)
    ob, db, _ = cam_mod.camera_rays(cam_b, 512, 512, pix, jnp.int32(0))
    ob, db = jax.block_until_ready(ob), jax.block_until_ready(db)
    print(f'big: {scene_b.num_tris} tris, {ctx_b.clusters.count} clusters', flush=True)
    profile_scene('big stream', ctx_b.clusters, ob, db, stream=True)


if __name__ == '__main__':
    main()
