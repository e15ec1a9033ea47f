"""TPU probe: how much MT math would an in-kernel per-cluster cull save?

For the 1M-tri exterior scene, measures per-block (block=128/256):
  * supercluster worklist length (exact per-ray entries, block-reduced)
  * cluster worklist after interval refinement (current stream stage-1)
  * cluster count whose exact per-ray entry < T_MAX for >= 1 ray in the block
    (upper bound of what an in-kernel exact AABB cull would MT-test, ignoring
    t_best tightening, which only helps more)
Computed on a 64k-ray subset so the fused (R, C) exact matrix is affordable.
Also times stream block=128 for reference.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.ops.cluster import _cluster_entry, SUPER_SIZE
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod


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
    print(f'big: {scene.num_tris} tris, {cs.count} clusters', flush=True)

    n_sub = 65536
    o_s, d_s = o[::4][:n_sub], d[::4][:n_sub]  # stride: cover the whole image
    tm = jnp.full((n_sub,), packet.T_MAX)

    for block in (128, 256):
        nb = n_sub // block

        @jax.jit
        def stats(o, d):
            # exact per-ray supercluster entries, block-reduced
            es = _cluster_entry(o, d, (cs.super_min, cs.super_max), tm)
            es_b = jnp.min(es.reshape(nb, block, -1), axis=1)
            wl_s = jnp.sum(es_b < packet.T_MAX * 0.5, axis=1)
            # exact per-ray CLUSTER entries, block-reduced (the oracle)
            ec = _cluster_entry(o, d, cs, tm)
            ec_b = jnp.min(ec.reshape(nb, block, -1), axis=1)
            wl_c_exact = jnp.sum(ec_b < packet.T_MAX * 0.5, axis=1)
            return wl_s, wl_c_exact

        wl_s, wl_cx = jax.block_until_ready(stats(o_s, d_s))
        _, keys, _ = jax.jit(
            lambda o, d, b=block: packet._block_worklists_super(o, d, cs, tm, b)
        )(o_s, d_s)
        wl_cur = np.asarray((keys < packet.T_MAX * 0.5).sum(axis=1))
        wl_s, wl_cx = np.asarray(wl_s), np.asarray(wl_cx)
        print(f'block={block}: super wl mean={wl_s.mean():.1f} p90={np.percentile(wl_s,90):.0f} | '
              f'cluster wl current(interval)={wl_cur.mean():.1f} '
              f'exact-oracle={wl_cx.mean():.1f} '
              f'(cull would skip {(1-wl_cx.mean()/max(wl_cur.mean(),1e-9))*100:.0f}% of MT)',
              flush=True)
        # math comparison: supercluster-walk MT tests = wl_s * 8 clusters
        print(f'  super-walk MT upper bound (no cull): {wl_s.mean()*SUPER_SIZE:.1f} '
              f'clusters/packet; with exact cull: {wl_cx.mean():.1f}', flush=True)

    # stream timing at block=128 (full 262k rays)
    fn = jax.jit(lambda o, d: packet.closest_hit_packet(cs, o, d, block=128, stream=True))
    out = jax.block_until_ready(fn(o, d))
    t0 = time.perf_counter()
    for _ in range(5):
        out = fn(o, d)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(f'stream block=128: {dt*1e3:.2f} ms -> {o.shape[0]/dt/1e6:.2f} Mrays/s', flush=True)


if __name__ == '__main__':
    main()
