"""TPU probe: per-component cost of the shaderballs512 frame (post in-kernel-uv).

Times each building block standalone: sorted/unsorted packet launches, the
morton sort machinery, decode_hit, shading, reference accumulation.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod
from nrdsample_tpu import config as cfgmod

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
cs = ctx.clusters

W = H = 512
R = W * H
cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0, aspect=1.0)
pix = jnp.arange(R, dtype=jnp.int32)

def bench(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.3f} ms', flush=True)
    return out

f_rays = jax.jit(lambda f: cam_mod.camera_rays(cam, W, H, pix, f))
o, d, _ = bench('camera_rays', f_rays, jnp.int32(0))

f_prim = jax.jit(lambda o, d: packet.closest_hit_packet(cs, o, d, block=128, hoist=True))
hit = bench('primary launch', f_prim, o, d)

# divergent bounce rays
rs = np.random.RandomState(0)
hitm = np.asarray(hit['tri']) >= 0
x = np.asarray(o + hit['t'][:, None] * d)
x = np.where(hitm[:, None], x, 0.0).astype(np.float32)
db = rs.randn(R, 3).astype(np.float32)
db /= np.linalg.norm(db, axis=-1, keepdims=True)
ob = jnp.asarray(x + db * 1e-3)
db = jnp.asarray(db)

f_sorted = jax.jit(lambda o, d: packet.closest_hit_packet(cs, o, d, block=128, hoist=True, sort=True))
bench('bounce launch sorted', f_sorted, ob, db)
f_uns = jax.jit(lambda o, d: packet.closest_hit_packet(cs, o, d, block=128, hoist=True, sort=False))
bench('bounce launch unsorted', f_uns, ob, db)

f_shadow = jax.jit(lambda o, d: packet.any_hit_packet(cs, o, d, jnp.full((R,), 1e5, jnp.float32), block=128, hoist=True, sort=True))
bench('shadow any_hit sorted', f_shadow, ob, db)

# sort machinery alone
def sort_only(o, d):
    key = packet._morton_sort_keys(o, d, cs)
    perm = jnp.argsort(key)
    packed = jnp.concatenate([o, d, jnp.ones((R, 1))], axis=1)[perm]
    inv = jnp.argsort(perm)
    return packed[inv]
bench('morton+argsort+gathers', jax.jit(sort_only), ob, db)

# decode_hit
from nrdsample_tpu.render import gbuffer
sun_dir = jnp.array([0.0, 0.3, 0.95]); sun_dir = sun_dir / jnp.linalg.norm(sun_dir)
f_dec = jax.jit(lambda h, o, d: gbuffer.decode_hit(scene, h, o, d, sun_dir, jnp.float32(0.01), False, jnp.float32(1.0)))
props = bench('decode_hit', f_dec, hit, o, d)

from nrdsample_tpu.render import lighting
f_dl = jax.jit(lambda p: lighting.direct_sun_lighting(p["n"], p["v"], p["base_color"], p["metalness"], p["roughness"], sun_dir, jnp.float32(0.01), False))
bench('direct_sun_lighting', f_dl, props)

from nrdsample_tpu.render import trace_opaque as topq
f_gen = jax.jit(lambda p: topq.generate_ray_and_update_throughput(
    p, jnp.ones((R, 3)), jnp.zeros((R,), bool), pix, jnp.int32(1), 123))
bench('generate_ray(no IS)', f_gen, props)
