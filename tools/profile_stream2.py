"""TPU probe: HBM-streaming packet kernel levers at Bistro scale (~1M tris).

The stream loop is DMA-bound (8 x 8KB scattered slab DMAs per trip); knobs:
  * block size: bigger ray blocks amortize each cluster fetch over more rays
    (t-pruning quality drops, math per cluster grows — measure, don't guess)
  * worklist stats: how long are the walks actually?
Run by absolute path on the axon TPU.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod


def bench(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    r = args[0].shape[0]
    print(f'{name}: {dt*1e3:.2f} ms -> {r/dt/1e6:.2f} Mrays/s', flush=True)
    return out


def main():
    scene = procedural.exterior(cobbles=120, tree_count=450, tree_res=28)
    ctx, scene = traversal.build_context(scene)
    cs = ctx.clusters
    cam = look_at(eye=[0.0, -45.0, 6.0], target=[0.0, 0.0, 4.0], fov_y_deg=55.0,
                  aspect=1.0)
    W = H = 512
    pix = jnp.arange(W * H, dtype=jnp.int32)
    o, d, _ = cam_mod.camera_rays(cam, W, H, pix, jnp.int32(0))
    o, d = jax.block_until_ready(o), jax.block_until_ready(d)
    print(f'big: {scene.num_tris} tris, {cs.count} clusters, '
          f'slab {packet.vmem_table_bytes(cs)/2**20:.1f} MiB', flush=True)

    # ---- stage-1 worklist stats at each block size ----
    for block in (256, 512, 1024):
        order, keys, count = jax.jit(
            lambda o, d, b=block: packet._block_worklists_super(
                o, d, cs, jnp.full((o.shape[0],), packet.T_MAX), b)
        )(o, d)
        k = np.asarray(keys)
        wl = (k < packet.T_MAX * 0.5).sum(axis=1)
        print(f'  block={block}: worklist p50={np.percentile(wl,50):.0f} '
              f'p90={np.percentile(wl,90):.0f} max={wl.max()} '
              f'mean={wl.mean():.1f} total_tests={wl.sum()*block/1e6:.1f}M raytri128',
              flush=True)

    # ---- timing: stream kernel at each block size ----
    for block in (256, 512, 1024):
        fn = jax.jit(lambda o, d, b=block: packet.closest_hit_packet(
            cs, o, d, block=b, stream=True))
        bench(f'stream block={block}', fn, o, d)

    # sorted divergent bounce rays
    rs = np.random.RandomState(0)
    db = rs.normal(size=d.shape).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    db = jnp.asarray(db)
    for block in (256, 512, 1024):
        fn = jax.jit(lambda o, d, b=block: packet.closest_hit_packet(
            cs, o, d, block=b, sort=True, stream=True))
        bench(f'stream sorted-div block={block}', fn, o, db)


if __name__ == '__main__':
    main()
