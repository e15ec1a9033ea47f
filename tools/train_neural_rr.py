"""Train the RR-slot recurrent denoiser (post/neural_rr.py) on repo-rendered
noisy/converged pairs. CPU-only; writes nrdsample_tpu/post/neural_rr.npz and
Tests/golden/neural_rr_holdout.npz (converged target for the held-out view,
consumed by tests/test_neural_rr.py).

Data: per view, the converged REFERENCE accumulation is the target; inputs
are single-frame (1 rpp) noisy composed renders at several frame indices,
with the DlssBefore-parity guide set (post/guides.py). The temporal path
trains by SELF-recurrent unrolling over 3 noisy frames (prev = the net's own
previous output), matching deployment.

Run: python tools/train_neural_rr.py  (~15-25 min on this box)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import time

import jax.numpy as jnp
import numpy as np
import optax

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.post import guides as guides_mod, neural_rr
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

RES = 96
FRAMES_CONVERGED = 160
NOISY_SEEDS = 6

VIEWS = [
    ("cornellbox", procedural.cornell_box,
     ([0.0, -3.2, 1.0], [0.0, 0.0, 1.0], 39.0),
     dict(sun_elevation=-30.0, disable_shadows=1)),
    ("cornellbox-b", procedural.cornell_box,
     ([0.9, -2.8, 1.6], [0.0, 0.0, 0.9], 45.0),
     dict(sun_elevation=-30.0, disable_shadows=1)),
    ("shaderballs", lambda: procedural.shader_balls(grid=2, sphere_res=16),
     ([0.0, -9.0, 4.5], [0.0, 0.0, 0.8], 50.0),
     dict(sun_elevation=45.0)),
    ("shaderballs-b", lambda: procedural.shader_balls(grid=2, sphere_res=16),
     ([3.0, -7.5, 3.0], [0.0, 0.0, 0.8], 55.0),
     dict(sun_elevation=45.0)),
    ("interior", lambda: procedural.interior_night(n_lights=8, grid=2,
                                                   sphere_res=10),
     ([0.0, -3.5, 1.8], [0.0, 1.5, 1.2], 60.0),
     dict(disable_shadows=1)),
]
# held out entirely from training; the test renders it through both the
# NEURAL and RELAX pipelines and compares PSNR against the shipped target
HOLDOUT = ("kitchen", procedural.kitchen,
           ([0.0, -1.6, 1.6], [0.0, 1.5, 1.2], 65.0),
           dict(sun_elevation=45.0))


def S(kw):
    return Settings(**{
        k: (jnp.int32(v) if k == "disable_shadows" else jnp.float32(v))
        for k, v in kw.items()})


def render_view(scene_fn, cam_spec, skw, noisy_seeds=NOISY_SEEDS):
    """(target (RES,RES,3), [noisy dicts]) in linear HDR."""
    scene = scene_fn()
    ctx, scene = traversal.build_context(scene)
    eye, tgt, fov = cam_spec
    cam = look_at(eye=eye, target=tgt, fov_y_deg=fov)
    cfg = RenderConfig(width=RES, height=RES, rpp=1, bounce_num=2,
                       tracing_mode=TracingMode.FULL_PROBABILISTIC,
                       denoiser=Denoiser.REFERENCE)
    settings = S(skw)

    @jax.jit
    def step(hist):
        return frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)

    hist = frame_mod.History.create(cfg)
    out = None
    for _ in range(FRAMES_CONVERGED):
        out, hist = step(hist)
    target = np.asarray(out["color"]).reshape(RES, RES, 3)

    noisies = []
    for seed in range(noisy_seeds):
        hist = frame_mod.History.create(cfg)
        # advance the frame index for decorrelated RNG streams
        import dataclasses as dc
        hist = dc.replace(hist, frame_index=jnp.int32(seed * 101))
        o, _ = step(hist)
        gb = o["gbuffer"]
        rg = guides_mod.rr_guides(gb, near=0.01)
        noisies.append({
            "noisy": np.asarray(o["color"]).reshape(RES, RES, 3),
            "diff_albedo": np.asarray(rg["diff_albedo"]).reshape(RES, RES, 3),
            "spec_albedo": np.asarray(rg["spec_albedo"]).reshape(RES, RES, 3),
            "normal_roughness": np.asarray(
                rg["normal_roughness"]).reshape(RES, RES, 4),
            "depth": np.asarray(rg["depth"]).reshape(RES, RES),
        })
    return target, noisies


def main():
    data = []
    for name, fn, camspec, skw in VIEWS:
        t0 = time.time()
        target, noisies = render_view(fn, camspec, skw)
        print(f"{name}: {time.time()-t0:.0f}s target-mean={target.mean():.3f}",
              flush=True)
        data.append((target, noisies))

    # held-out target (shipped for the test)
    t0 = time.time()
    ho_target, ho_noisies = render_view(HOLDOUT[1], HOLDOUT[2], HOLDOUT[3],
                                        noisy_seeds=1)
    print(f"holdout {HOLDOUT[0]}: {time.time()-t0:.0f}s", flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    np.savez(os.path.join(repo, "Tests", "golden", "neural_rr_holdout.npz"),
             target=ho_target.astype(np.float32))

    params = neural_rr.init_params(jax.random.PRNGKey(1))
    opt = optax.adam(optax.cosine_decay_schedule(2e-3, 700 * 5))
    opt_state = opt.init(params)

    def unrolled_loss(params, seq, g_da, g_sa, g_nr, g_d, target):
        """SELF-recurrent unroll over the noisy sequence (static camera ->
        prev needs no reprojection): prev is the net's OWN previous output,
        so the trained recurrence matches deployment exactly."""
        guides = {"diff_albedo": g_da, "spec_albedo": g_sa,
                  "normal_roughness": g_nr, "depth": g_d}
        c = lambda x: x / (1.0 + x)
        prev = jnp.zeros_like(target)
        loss = 0.0
        for t in range(seq.shape[0]):
            pred = neural_rr.apply(params, seq[t], guides, prev,
                                   1.0 if t > 0 else 0.0)
            loss = loss + jnp.mean(jnp.abs(c(pred) - c(target)))
            prev = pred
        return loss / seq.shape[0]

    @jax.jit
    def train_step(params, opt_state, seq, g_da, g_sa, g_nr, g_d, target):
        l, g = jax.value_and_grad(unrolled_loss)(
            params, seq, g_da, g_sa, g_nr, g_d, target)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    rs = np.random.RandomState(0)
    steps = 700
    for it in range(steps):
        tot, cnt = 0.0, 0
        flip = it % 2 == 1

        def f(a, flip=flip):
            # flip the image y-axis (works for (H,W,...) arrays)
            return np.ascontiguousarray(a[::-1]) if flip else a

        for target, noisies in data:
            # 3-frame self-recurrent unroll, randomized frame order
            order = rs.permutation(len(noisies))[:3]
            seq = np.stack([f(noisies[i]["noisy"]) for i in order])
            nz = noisies[0]
            params, opt_state, l = train_step(
                params, opt_state, jnp.asarray(seq),
                jnp.asarray(f(nz["diff_albedo"])),
                jnp.asarray(f(nz["spec_albedo"])),
                jnp.asarray(f(nz["normal_roughness"])),
                jnp.asarray(f(nz["depth"])),
                jnp.asarray(f(target)))
            tot += float(l)
            cnt += 1
        if it % 25 == 0 or it == steps - 1:
            print(f"step {it}: L1={tot/cnt:.5f}", flush=True)

    neural_rr.save_weights(params)
    print(f"saved {neural_rr.WEIGHTS_PATH}", flush=True)

    # self-eval: PSNR of 1-frame denoise vs noisy, per training view
    for (target, noisies), (name, _, _, _) in zip(data, VIEWS):
        nz = noisies[0]
        guides = {k: jnp.asarray(nz[k]) for k in
                  ("diff_albedo", "spec_albedo", "normal_roughness", "depth")}
        pred = np.asarray(neural_rr.apply(
            params, jnp.asarray(nz["noisy"]), guides,
            jnp.zeros_like(jnp.asarray(target)), 0.0))
        def psnr(a):
            return -10 * np.log10(np.mean((np.clip(a, 0, 4) - np.clip(target, 0, 4)) ** 2) + 1e-12)
        print(f"{name}: noisy {psnr(nz['noisy']):.2f} dB -> "
              f"denoised {psnr(pred):.2f} dB", flush=True)


if __name__ == "__main__":
    main()
