"""Round-5 TPU probe: exterior720 per-launch decomposition.

exterior720 is 0.05x vs baseline (the worst ladder entry). The frame is
~4.8 s at ~14 world-cast launches; this times one launch's stage-1 pieces
(supercluster exact entry, cluster interval refine, packed sort) and the
streaming kernel, to find where the ~300 ms/launch goes."""
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
    print(f'{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms', flush=True)
    return out


def main():
    t0 = time.time()
    scene = procedural.exterior(cobbles=120, tree_count=450, tree_res=28)
    ctx, scene = traversal.build_scene_contexts(scene)
    op = ctx.opaque
    cs = op.clusters
    print(f'build {time.time()-t0:.0f}s tris {scene.num_tris} clusters {cs.count}',
          flush=True)

    W, H = 1280, 720
    R = W * H
    cam = look_at(eye=[0.0, -45.0, 6.0], target=[0.0, 0.0, 4.0],
                  fov_y_deg=55.0, aspect=W / H)
    pix = jnp.arange(R, dtype=jnp.int32)
    o, d, _ = jax.jit(
        lambda f: cam_mod.camera_rays(cam, W, H, pix, f))(jnp.int32(0))
    tm = jnp.full((R,), 1e5, jnp.float32)
    block = 128

    bench('stage1 super (full)', jax.jit(
        lambda o, d, tm: packet._block_worklists_super(o, d, cs, tm, block)[0]),
        o, d, tm)
    bench('  super exact block_min', jax.jit(
        lambda o, d, tm: packet._block_min_entry(
            o, d, (cs.super_min, cs.super_max), tm, block)), o, d, tm)
    bench('  cluster interval parts', jax.jit(
        lambda o, d, tm: packet._block_worklists_interval_parts(
            o, d, cs, tm, block)[0]), o, d, tm)
    nb = R // block
    key = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (nb, cs.count)))
    hit = key < 1.0
    keym = jnp.where(hit, key, packet.T_MAX)
    bench('  packed sort (C-wide rows)', jax.jit(
        lambda k, h: packet._sort_worklists(k, h)[0]), keym, hit)

    f_launch = jax.jit(lambda o, d, tm: packet.closest_hit_packet(
        cs, o, d, t_max=tm, block=block, sort=False))
    hitres = bench('primary launch total', f_launch, o, d, tm)
    f_launch_s = jax.jit(lambda o, d, tm: packet.closest_hit_packet(
        cs, o, d, t_max=tm, block=block, sort=True))
    bench('sorted launch total', f_launch_s, o, d, tm)


if __name__ == '__main__':
    main()
