"""TPU micro-profile of stage-1 components: entry matrix, interval test,
argsort variants. Run by absolute path on the axon TPU."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.ops.cluster import _cluster_entry, SUPER_SIZE
from nrdsample_tpu.ops.intersect import T_MAX
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod

BLOCK = 256


def bench(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f'{name}: {dt*1e3:.2f} ms', flush=True)
    return out


def main():
    # per-dispatch tunnel overhead baseline: a trivial jitted op
    z = jnp.zeros((8, 128), jnp.float32)
    bench('dispatch overhead (x+1)', jax.jit(lambda a: a + 1.0), z)

    scene = procedural.shader_balls(grid=3, sphere_res=24)
    ctx, scene = traversal.build_context(scene)
    cs = ctx.clusters
    cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0)
    pix = jnp.arange(512 * 512, dtype=jnp.int32)
    o, d, _ = cam_mod.camera_rays(cam, 512, 512, pix, jnp.int32(0))
    o, d = jax.block_until_ready(o), jax.block_until_ready(d)
    r = o.shape[0]
    tm = jnp.full((r,), T_MAX, jnp.float32)
    nb = r // BLOCK
    print(f'small: C={cs.count}, nb={nb}', flush=True)

    # entry matrix + block-min only
    def entry_blockmin(o, d, tm):
        e = _cluster_entry(o, d, cs, tm)
        return jnp.min(e.reshape(nb, BLOCK, cs.count), axis=1)
    key = bench('small entry+blockmin', jax.jit(entry_blockmin), o, d, tm)

    # chunked variant: map over packet chunks to bound working set
    def entry_chunked(o, d, tm):
        oc = o.reshape(nb, BLOCK, 3)
        dc = d.reshape(nb, BLOCK, 3)
        tc = tm.reshape(nb, BLOCK)
        def one(args):
            oo, dd, tt = args
            e = _cluster_entry(oo, dd, cs, tt)
            return jnp.min(e, axis=0)
        return jax.lax.map(one, (oc, dc, tc), batch_size=64)
    bench('small entry chunked(64)', jax.jit(entry_chunked), o, d, tm)

    hit = key < T_MAX
    keyv = jnp.where(hit, key, T_MAX)
    bench('small co-argsort', jax.jit(
        lambda k: jnp.take_along_axis(k, jnp.argsort(k, axis=1), axis=1)), keyv)

    def packed_sort(k):
        bits = jax.lax.bitcast_convert_type(k, jnp.int32)
        cpack = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1)
        packed = jnp.sort((bits & ~jnp.int32(0x3FFF)) | cpack, axis=1)
        return packed & jnp.int32(0x3FFF), jax.lax.bitcast_convert_type(
            packed & ~jnp.int32(0x3FFF), jnp.float32)
    bench('small packed-sort', jax.jit(packed_sort), keyv)

    # ---- big scene ----
    scene_b = procedural.exterior(cobbles=120, tree_count=450, tree_res=28,
                                  glass=False)
    ctx_b, scene_b = traversal.build_context(scene_b, mode='cluster')
    cs_b = ctx_b.clusters
    cam_b = look_at(eye=[0.0, -45.0, 6.0], target=[0.0, 0.0, 4.0], fov_y_deg=55.0)
    ob, db, _ = cam_mod.camera_rays(cam_b, 512, 512, pix, jnp.int32(0))
    ob, db = jax.block_until_ready(ob), jax.block_until_ready(db)
    print(f'big: C={cs_b.count}, Cs={cs_b.super_min.shape[0]}', flush=True)

    def entry_super(o, d, tm):
        e = _cluster_entry(o, d, (cs_b.super_min, cs_b.super_max), tm)
        return jnp.min(e.reshape(nb, BLOCK, -1), axis=1)
    sup_key = bench('big super entry+blockmin', jax.jit(entry_super), ob, db, tm)

    def entry_super_chunked(o, d, tm):
        oc = o.reshape(nb, BLOCK, 3)
        dc = d.reshape(nb, BLOCK, 3)
        tc = tm.reshape(nb, BLOCK)
        def one(args):
            oo, dd, tt = args
            e = _cluster_entry(oo, dd, (cs_b.super_min, cs_b.super_max), tt)
            return jnp.min(e, axis=0)
        return jax.lax.map(one, (oc, dc, tc), batch_size=64)
    bench('big super entry chunked(64)', jax.jit(entry_super_chunked), ob, db, tm)

    fn_int = jax.jit(lambda o, d, t: packet._block_worklists_interval_parts(
        o, d, cs_b, t, BLOCK))
    bench('big interval', fn_int, ob, db, tm)

    # interval test at SUPERCLUSTER level (no (R,Cs) matrix at all)
    class SupCS:
        bounds_min = cs_b.super_min
        bounds_max = cs_b.super_max
        count = cs_b.super_min.shape[0]
    fn_sint = jax.jit(lambda o, d, t: packet._block_worklists_interval_parts(
        o, d, SupCS, t, BLOCK))
    bench('big sup-interval', fn_sint, ob, db, tm)
    # worklist inflation if sup-exact is replaced by sup-interval
    hit_si, lb_si, _ = fn_sint(ob, db, tm)
    hit_i, lb_i, _ = fn_int(ob, db, tm)
    sup_hit_exact = np.asarray(sup_key) < T_MAX
    hit_exact_ref = np.repeat(sup_hit_exact, SUPER_SIZE, axis=1)[:, :cs_b.count] & np.asarray(hit_i)
    hit_interval = np.repeat(np.asarray(hit_si), SUPER_SIZE, axis=1)[:, :cs_b.count] & np.asarray(hit_i)
    print(f'  count exact-sup: mean={hit_exact_ref.sum(1).mean():.1f}  '
          f'interval-sup: mean={hit_interval.sum(1).mean():.1f}', flush=True)

    keyb = jnp.where(jnp.asarray(hit_exact_ref), lb_i, T_MAX)
    bench('big co-argsort', jax.jit(
        lambda k: jnp.take_along_axis(k, jnp.argsort(k, axis=1), axis=1)), keyb)
    bench('big packed-sort', jax.jit(packed_sort), keyb)


if __name__ == '__main__':
    main()
