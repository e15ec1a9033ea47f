"""TPU probe: packet-path emissive light probe on a Bistro-night-scale
emitter set (exterior, ~4k emissive tris) — parity vs the dense form and
throughput of the batched K-candidate probe."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.render import emissive_is


def main():
    scene = procedural.exterior(cobbles=120, tree_count=450, tree_res=28)
    ctx, scene = traversal.build_scene_contexts(scene)
    cl = getattr(ctx.opaque, "emissive", None)
    print(f'emissive kept: {int(scene.emissive_count)} '
          f'clusters: {None if cl is None else int(cl["clusters"].count)}',
          flush=True)
    assert cl is not None

    em = emissive_is.build_emissive_set(scene, 1.0, clusters=cl)

    rs = np.random.RandomState(0)
    r = 65536
    k = 4
    o = jnp.asarray((rs.rand(r, 3).astype(np.float32) - 0.5) * 60.0
                    + np.array([0, 0, 6.0], np.float32))
    d = rs.normal(size=(k, r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    act = jnp.ones((k, r), jnp.float32)

    lp = jax.jit(lambda o, d: emissive_is.light_probe_batch(
        em, o, (d[..., 0], d[..., 1], d[..., 2]), act))
    li_pkt = jax.block_until_ready(lp(o, d))

    # dense oracle on a subset (full dense at E=4096 x 65k is affordable once)
    em_dense = {kk: em[kk] for kk in ("p0", "e1", "e2", "intensity")}
    li_dense = jax.block_until_ready(jax.jit(
        lambda o, d: jax.vmap(
            lambda dd: emissive_is.light_probe(em_dense, o, dd))(d)
    )(o, d))
    a, b = np.asarray(li_pkt), np.asarray(li_dense)
    mism = (np.abs(a - b) > 1e-4 * np.maximum(1.0, np.abs(b))).mean()
    print(f'parity: mismatch fraction {mism:.2e} '
          f'max|d|={np.abs(a-b).max():.3e}', flush=True)

    t0 = time.perf_counter()
    for _ in range(5):
        out = lp(o, d)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(f'packet probe: {dt*1e3:.2f} ms for {k*r/1e6:.2f}M candidate rays '
          f'-> {k*r/dt/1e6:.1f} Mrays/s', flush=True)


if __name__ == '__main__':
    main()
