import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal, packet
from nrdsample_tpu.scene.types import look_at
from nrdsample_tpu.scene import camera as cam_mod

scene = procedural.shader_balls(grid=3, sphere_res=24)
ctx, scene = traversal.build_context(scene)
cs = ctx.clusters
print('clusters', cs.count, flush=True)

W = H = 512
cam = look_at(eye=[0.0, -9.0, 4.5], target=[0.0, 0.0, 0.8], fov_y_deg=50.0, aspect=1.0)
pix = jnp.arange(W*H, dtype=jnp.int32)
o, d, _ = cam_mod.camera_rays(cam, W, H, pix, jnp.int32(0))
o = jax.block_until_ready(o); R = W*H
print('rays ready', flush=True)

# bounce-like divergent rays: reflect off the scene (reuse primaries' hits on CPU? too slow)
# instead: jumble the primaries (permutation) so packets lose coherence, sort=True re-bins
rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(R), jnp.int32)
oj, dj = o[perm], d[perm]

def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    n = 8
    for _ in range(n): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n
    print(f'{name}: {dt*1e3:.2f} ms -> {R/dt/1e6:.1f} Mrays/s', flush=True)
    return out

ref = None
for tag, kw in [
    ('baseline', {}),
    ('prologue2', dict(prologue=2)),
    ('prologue4', dict(prologue=4)),
    ('inter2', dict(interleave=2)),
    ('inter4', dict(interleave=4)),
    ('inter8', dict(interleave=8)),
    ('hoist', dict(hoist=True)),
    ('prologue2+hoist', dict(prologue=2, hoist=True)),
]:
    fn = jax.jit(lambda o, d, kw=kw: packet.closest_hit_packet(cs, o, d, **kw))
    out = bench(f'primary {tag}', fn, o, d)
    if ref is None:
        ref = out
    else:
        t_ok = np.allclose(np.asarray(out['t']), np.asarray(ref['t']), rtol=1e-4, atol=1e-3)
        tri_match = float(np.mean(np.asarray(out['tri']) == np.asarray(ref['tri'])))
        print(f'  parity vs baseline: t {t_ok} tri {tri_match:.4f}', flush=True)

for tag, kw in [
    ('baseline', {}),
    ('prologue2', dict(prologue=2)),
    ('inter4', dict(interleave=4)),
    ('hoist', dict(hoist=True)),
]:
    fn = jax.jit(lambda o, d, kw=kw: packet.closest_hit_packet(cs, o, d, sort=True, **kw))
    bench(f'sorted-jumbled {tag}', fn, oj, dj)
