"""Train the neural-SR residual CNN (post/neural_sr.py) on repo-rendered
low/high-res pairs. CPU-only; writes nrdsample_tpu/post/neural_sr.npz.

Data: REFERENCE-accumulated renders (converged) of procedural scenes at
(H, W) and (H/2, W/2); input = low-res color + low-res guides, target =
high-res color. Kitchen is held OUT (tests/test_neural_sr.py evaluates PSNR
vs Lanczos there).

Run: python tools/train_neural_sr.py  (~10-20 min on this box)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import functools
import time

import jax.numpy as jnp
import numpy as np
import optax

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.post import guides as guides_mod, neural_sr
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

HI = 128
FRAMES = 96

TRAIN_VIEWS = [
    ("cornellbox", procedural.cornell_box,
     ([0.0, -3.2, 1.0], [0.0, 0.0, 1.0], 39.0)),
    ("cornellbox-b", procedural.cornell_box,
     ([0.9, -2.8, 1.6], [0.0, 0.0, 0.9], 45.0)),
    ("shaderballs", lambda: procedural.shader_balls(grid=2, sphere_res=16),
     ([0.0, -9.0, 4.5], [0.0, 0.0, 0.8], 50.0)),
    ("shaderballs-b", lambda: procedural.shader_balls(grid=2, sphere_res=16),
     ([3.0, -7.5, 3.0], [0.0, 0.0, 0.8], 55.0)),
    ("interior", lambda: procedural.interior_night(n_lights=8, grid=2,
                                                   sphere_res=10),
     ([0.0, -3.5, 1.8], [0.0, 1.5, 1.2], 60.0)),
]


def render_pair(scene_fn, cam_spec, settings):
    """Converged lo/hi pair in the TONEMAPPED domain — the deployment site
    (pipeline/frame.py post chain) feeds the SR slot tonemap-range color, so
    the network must train on the same distribution."""
    from nrdsample_tpu.post import final as final_mod

    scene = scene_fn()
    ctx, scene = traversal.build_context(scene)
    eye, tgt, fov = cam_spec
    exp = float(settings.exposure) * 1e-2
    out = {}
    for tag, size in (("hi", HI), ("lo", HI // 2)):
        cam = look_at(eye=eye, target=tgt, fov_y_deg=fov)
        cfg = RenderConfig(width=size, height=size, rpp=1, bounce_num=2,
                           tracing_mode=TracingMode.FULL_PROBABILISTIC,
                           denoiser=Denoiser.REFERENCE)
        hist = frame_mod.History.create(cfg)

        @jax.jit
        def step(hist):
            return frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)

        for _ in range(FRAMES):
            o, hist = step(hist)
        img = np.asarray(
            final_mod.tonemap_output(o["color"].reshape(size, size, 3), exp))
        out[tag] = img
        if tag == "lo":
            gb = o["gbuffer"]
            out["guides"] = {
                "normal": np.asarray(gb["normal"]).reshape(size, size, 3),
                "roughness": np.asarray(gb["roughness"]).reshape(size, size),
                "depth": np.asarray(
                    guides_mod.hw_depth(gb["view_z"], 0.01)).reshape(size, size),
            }
    return out


def main():
    settings = Settings(sun_elevation=jnp.float32(-30.0),
                        disable_shadows=jnp.int32(1))
    data = []
    for name, fn, camspec in TRAIN_VIEWS:
        t0 = time.time()
        pair = render_pair(fn, camspec, settings)
        print(f"{name}: rendered in {time.time()-t0:.0f}s "
              f"hi-mean={pair['hi'].mean():.3f}", flush=True)
        data.append(pair)

    params = neural_sr.init_params(jax.random.PRNGKey(0))
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def loss_fn(params, lo, guides, hi):
        pred = neural_sr.apply(params, lo, guides, hi.shape[0], hi.shape[1])
        return jnp.mean(jnp.abs(pred - hi))

    @jax.jit
    def train_step(params, opt_state, lo, gn, gr, gd, hi):
        guides = {"normal": gn, "roughness": gr, "depth": gd}
        l, g = jax.value_and_grad(loss_fn)(params, lo, guides, hi)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    def flips(a):
        # 4 augmentations: identity, flip-y, flip-x, both
        yield a
        yield a[::-1]
        yield a[:, ::-1]
        yield a[::-1, ::-1]

    steps = 120
    for it in range(steps):
        tot = 0.0
        for pair in data:
            for lo, gn, gr, gd, hi in zip(
                    flips(pair["lo"]), flips(pair["guides"]["normal"]),
                    flips(pair["guides"]["roughness"]),
                    flips(pair["guides"]["depth"]), flips(pair["hi"])):
                params, opt_state, l = train_step(
                    params, opt_state, jnp.asarray(np.ascontiguousarray(lo)),
                    jnp.asarray(np.ascontiguousarray(gn)),
                    jnp.asarray(np.ascontiguousarray(gr)),
                    jnp.asarray(np.ascontiguousarray(gd)),
                    jnp.asarray(np.ascontiguousarray(hi)))
                tot += float(l)
        if it % 10 == 0 or it == steps - 1:
            print(f"step {it}: L1={tot/(len(data)*4):.5f}", flush=True)

    neural_sr.save_weights(params)
    print(f"saved {neural_sr.WEIGHTS_PATH}", flush=True)

    # quick self-eval vs lanczos on the training views
    from nrdsample_tpu.post import upscale
    for pair, (name, _, _) in zip(data, TRAIN_VIEWS):
        hi = pair["hi"]
        lz = np.asarray(upscale.lanczos_resize(jnp.asarray(pair["lo"]), HI, HI))
        nn = np.asarray(neural_sr.apply(
            params, jnp.asarray(pair["lo"]),
            {k: jnp.asarray(v) for k, v in pair["guides"].items()}, HI, HI))
        def psnr(a):
            return -10 * np.log10(np.mean((a - hi) ** 2) + 1e-12)
        print(f"{name}: lanczos {psnr(lz):.2f} dB -> neural {psnr(nn):.2f} dB",
              flush=True)


if __name__ == "__main__":
    main()
