"""TPU probe (round 3): stage-1 worklist construction cost breakdown.

stage-1 measured 3.21 ms of the 11.25 ms primary launch at shaderballs512
(tools/profile_kernelvar2.py) — 29% of the launch and 75% of the north-star
per-launch budget (262k rays / 62.5 Mrays/s = 4.2 ms). Measures the flat
exact path (production for small C) against the supercluster-hierarchy
variant at C=104, the interval-only variant, plus the pieces (entry matrix,
packed sort, morton re-bin) in isolation, and end-to-end kernel cost with
each stage-1 (conservative keys cost kernel iterations — the end-to-end
number is the decider, per the _block_worklists docstring note).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod


def bench(name, fn, *args, n=20, rays=None):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    extra = f' -> {rays/dt/1e6:.2f} Mrays/s' if rays else ''
    print(f'{name}: {dt*1e3:.3f} ms{extra}', flush=True)
    return out


def main():
    scene = procedural.shader_balls(grid=3, sphere_res=24)
    ctx, scene = traversal.build_context(scene)
    cs = ctx.clusters
    print(f'clusters={cs.count} supers={cs.super_min.shape[0]}', flush=True)
    W = H = 512
    R = W * H
    cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8],
                  fov_y_deg=50.0, aspect=1.0)
    pix = jnp.arange(R, dtype=jnp.int32)
    o, d, _ = jax.jit(lambda f: cam_mod.camera_rays(cam, W, H, pix, f))(jnp.int32(0))
    o, d = jax.block_until_ready(o), jax.block_until_ready(d)
    tm = jnp.full((R,), packet.T_MAX)

    rs = np.random.RandomState(0)
    db = rs.randn(R, 3).astype(np.float32)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    db = jnp.asarray(db)

    # pieces
    bench('entry-matrix+blockmin', jax.jit(
        lambda o, d: packet._block_min_entry(o, d, cs, tm, 128)), o, d)
    bn = jax.jit(lambda o, d: packet._block_min_entry(o, d, cs, tm, 128))(o, d)
    bn = jax.block_until_ready(bn)
    hit = bn < packet.T_MAX
    key = jnp.where(hit, bn, packet.T_MAX)
    bench('packed-sort', jax.jit(packet._sort_worklists), key, hit)
    # divergent directions on purpose: measures the BOUNCE-ray re-bin cost
    # (primary rays are already coherent and skip the re-sort in production)
    bench('morton-keys+argsort (divergent bounce dirs)', jax.jit(
        lambda o, d_div: jnp.argsort(packet._morton_sort_keys(o, d_div, cs))),
        o, db)

    # full stage-1 variants
    s1_flat = jax.jit(lambda o, d: packet._block_worklists(o, d, cs, tm, 128))
    s1_super = jax.jit(lambda o, d: packet._block_worklists_super(o, d, cs, tm, 128))
    bench('stage1 flat (prod)', s1_flat, o, d)
    bench('stage1 super', s1_super, o, d)
    of, kf, cf = jax.block_until_ready(s1_flat(o, d))
    os_, ks, cs_ = jax.block_until_ready(s1_super(o, d))
    print(f'worklist mean: flat={np.mean(np.asarray(cf)):.2f} '
          f'super={np.mean(np.asarray(cs_)):.2f}', flush=True)

    # end-to-end with each stage-1 (decider)
    f_prod = jax.jit(lambda o, d: packet.closest_hit_packet(
        cs, o, d, block=128, hoist=True))
    bench('e2e primary flat+hoist', f_prod, o, d, rays=R)
    f_sup = jax.jit(lambda o, d: packet.closest_hit_packet(
        cs, o, d, block=128, hoist=True, stage1='super'))
    try:
        bench('e2e primary super+hoist', f_sup, o, d, rays=R)
    except TypeError:
        print('closest_hit_packet has no stage1 kwarg (expected pre-patch)',
              flush=True)


if __name__ == '__main__':
    main()
