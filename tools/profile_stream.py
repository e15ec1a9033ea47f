"""TPU profile: VMEM-resident vs HBM-streaming packet kernel.

Run by absolute path on the axon TPU (no PYTHONPATH — see tools/ header rule).
Small scene (shader_balls, 13k tris): both kernels, primary + sorted bounce.
Big scene (exterior ~1M tris): streaming kernel (resident can't fit) vs the
XLA cluster-scan fallback baseline.
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


def rays_for(scene_ctx_cam, W=512, H=512):
    ctx, cam = scene_ctx_cam
    pix = jnp.arange(W * H, dtype=jnp.int32)
    o, d, _ = cam_mod.camera_rays(cam, W, H, pix, jnp.int32(0))
    return jax.block_until_ready(o), jax.block_until_ready(d)


def main():
    # ---- small scene: resident vs streaming ----
    scene = procedural.shader_balls(grid=3, sphere_res=24)
    ctx, scene = traversal.build_context(scene)
    cs = ctx.clusters
    cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0)
    o, d = rays_for((ctx, cam))
    print(f'small: {scene.num_tris} tris, {cs.count} clusters, '
          f'slab {packet.vmem_table_bytes(cs)/2**20:.1f} MiB', flush=True)

    for stream in (False, True):
        tag = 'stream' if stream else 'resident'
        fn = jax.jit(lambda o, d, s=stream: packet.closest_hit_packet(
            cs, o, d, block=256, stream=s))
        res = bench(f'small primary {tag}', fn, o, d)
        if stream:
            r2 = jax.jit(lambda o, d: packet.closest_hit_packet(
                cs, o, d, block=256, stream=False))(o, d)
            t_a, t_b = np.asarray(res['t']), np.asarray(r2['t'])
            print(f'  parity vs resident: max|dt|={np.abs(t_a-t_b).max():.2e}',
                  flush=True)
        fnb = jax.jit(lambda o, d, s=stream: packet.closest_hit_packet(
            cs, o, d, block=256, sort=True, stream=s))
        # bounce-like rays: random directions from surface points
        rs = np.random.RandomState(0)
        db = rs.normal(size=d.shape).astype(np.float32)
        db /= np.linalg.norm(db, axis=-1, keepdims=True)
        bench(f'small sorted-div {tag}', fnb, o, jnp.asarray(db))

    # ---- big scene: streaming vs XLA fallback ----
    scene_b = procedural.exterior(cobbles=120, tree_count=450, tree_res=28,
                                  glass=False)
    ctx_b, scene_b = traversal.build_context(scene_b, mode='cluster')
    cs_b = ctx_b.clusters
    cam_b = look_at(eye=[0.0, -45.0, 6.0], target=[0.0, 0.0, 4.0], fov_y_deg=55.0)
    ob, db_ = rays_for((ctx_b, cam_b))
    print(f'big: {scene_b.num_tris} tris, {cs_b.count} clusters, '
          f'slab {packet.vmem_table_bytes(cs_b)/2**20:.1f} MiB', flush=True)

    fn_s = jax.jit(lambda o, d: packet.closest_hit_packet(
        cs_b, o, d, block=256, stream=True))
    res_s = bench('big primary stream', fn_s, ob, db_)
    hits = float(np.mean(np.asarray(res_s['tri']) >= 0))
    print(f'  hit rate {hits:.3f}', flush=True)

    from nrdsample_tpu.ops import cluster as cl
    fn_x = jax.jit(lambda o, d: cl.closest_hit_clustered(cs_b, ctx_b.tris, o, d))
    res_x = bench('big primary xla-scan', fn_x, ob, db_, n=1)
    t_s, t_x = np.asarray(res_s['t']), np.asarray(res_x['t'])
    print(f'  parity stream vs xla: max|dt|={np.abs(t_s-t_x).max():.2e}', flush=True)


if __name__ == '__main__':
    main()
