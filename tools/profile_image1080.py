"""TPU probe (round 4): image-phase decomposition at 1080p.

kitchen1080's image phase is ~980 ms (profile_kitchen r4). Times each denoiser
block standalone on synthetic planes: RELAX denoise (full incl. taccum),
SIGMA, TAA, SH resolve, confidence chain, checkerboard hitT reconstruct.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np


def bench(name, fn, *args, n=8):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f'{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms', flush=True)
    return out


def main():
    from nrdsample_tpu.denoise import relax, sigma, taa, sh, confidence, checkerboard
    h, w = 1080, 1920
    rs = np.random.RandomState(0)
    f32 = np.float32
    illum = jnp.asarray(rs.rand(h, w, 3).astype(f32))
    vz = jnp.asarray((1 + rs.rand(h, w) * 5).astype(f32))
    nrm = rs.randn(h, w, 3).astype(f32)
    nrm = nrm * 0.3 + np.array([0, 0, 1.0], f32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = jnp.asarray(nrm)
    mv = jnp.asarray((rs.rand(h, w, 3) * 2 - 1).astype(f32) * 0.8)
    shadow = jnp.asarray((rs.rand(h, w) > 0.3).astype(f32))
    shd = jnp.asarray((rs.rand(h, w) * 2).astype(f32)) * (1 - shadow)

    hist_r = relax.RelaxHistory.create(h, w)
    bench('relax.denoise (1 signal)', jax.jit(
        lambda il: relax.denoise(hist_r, il, vz, nrm, mv)[0]), illum)

    hist_s = sigma.SigmaHistory.create(h, w)
    bench('sigma.denoise', jax.jit(
        lambda s_, hd: sigma.denoise(hist_s, s_, hd, vz, mv, 0.01, 1e-3,
                                     jnp.int32(3))[0]), shadow, shd)

    hist_t = taa.TaaHistory.create(h, w)
    wide = jnp.zeros((h, w), bool)
    bench('taa.apply', jax.jit(
        lambda il: taa.apply(hist_t, il, mv, vz, wide_mask=wide)[0]), illum)

    dirs = jnp.asarray(rs.randn(h * w, 3).astype(f32))
    bench('sh.resolve', jax.jit(
        lambda il: sh.resolve({"radiance": il.reshape(-1, 3), "dir": dirs},
                              nrm.reshape(-1, 3))), illum)

    hs, ws = h // 5, w // 5
    grad = jnp.asarray(rs.rand(hs, ws).astype(f32))
    pvz = jnp.asarray((1 + rs.rand(hs, ws)).astype(f32))
    pn = jnp.asarray(np.broadcast_to(np.array([0, 0, 1.0], f32), (hs, ws, 3)).copy())
    bench('confidence atrous x5 (1/5 res)', jax.jit(
        lambda g: confidence.atrous_blur(g, pvz, pn)), grad)

    bench('checkerboard hitT 3x3', jax.jit(
        lambda a: checkerboard.hitdist_reconstruct_3x3(a)), shd)


if __name__ == '__main__':
    main()
