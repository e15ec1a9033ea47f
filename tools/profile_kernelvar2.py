"""TPU probe (round 3): resident-kernel loop-structure matrix at block=128.

The shaderballs512 frame is trace-bound and the resident kernel is
latency-bound (p50 worklist ~1: serial loop setup dominates, not math).
Measures {baseline, hoist, prologue2+hoist, interleave 2/4/8} x
{coherent primary, morton-sorted divergent bounce} plus the stage-1 cost
alone, to pick the production default.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod


def bench(name, fn, *args, n=10):
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
    scene = procedural.shader_balls(grid=3, sphere_res=24)
    ctx, scene = traversal.build_context(scene)
    cs = ctx.clusters
    W = H = 512
    R = W * H
    cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8],
                  fov_y_deg=50.0, aspect=1.0)
    pix = jnp.arange(R, dtype=jnp.int32)
    o, d, _ = jax.jit(lambda f: cam_mod.camera_rays(cam, W, H, pix, f))(jnp.int32(0))
    o, d = jax.block_until_ready(o), jax.block_until_ready(d)

    rs = np.random.RandomState(0)
    db = rs.randn(R, 3).astype(np.float32)
    db /= np.linalg.norm(db, axis=-1, keepdims=True)
    db = jnp.asarray(db)

    # stage-1 alone (entry matrix + packed sort)
    tm = jnp.full((R,), packet.T_MAX)
    s1 = jax.jit(lambda o, d: packet._block_worklists(o, d, cs, tm, 128))
    bench('stage1 block=128', s1, o, d)

    variants = [
        ('base', {}),
        ('hoist', dict(hoist=True)),
        ('prologue2+hoist', dict(prologue=2, hoist=True)),
        ('interleave2', dict(interleave=2)),
        ('interleave4', dict(interleave=4)),
        ('interleave8', dict(interleave=8)),
    ]
    for name, kw in variants:
        f = jax.jit(lambda o, d, kw=kw: packet.closest_hit_packet(
            cs, o, d, block=128, **kw))
        bench(f'primary {name}', f, o, d)
    for name, kw in variants:
        f = jax.jit(lambda o, d, kw=kw: packet.closest_hit_packet(
            cs, o, d, block=128, sort=True, **kw))
        bench(f'bounce-sorted {name}', f, o, db)


if __name__ == '__main__':
    main()
