"""Learned SR in the DLSS-SR slot (post/neural_sr.py; NRDSample.cpp:791-867,
DlssBefore.cs.hlsl:36-62 guide parity).

Held-out evaluation: kitchen is EXCLUDED from tools/train_neural_sr.py's
training views; the shipped weights must beat plain Lanczos PSNR there, in the
tonemapped domain the deployment site (pipeline/frame.py post chain) uses."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.post import final as final_mod, guides as guides_mod
from nrdsample_tpu.post import neural_sr, upscale
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

HI = 64
FRAMES = 48


def test_untrained_network_is_exact_lanczos():
    """Zero-init final layer => the residual is exactly 0: the slot degrades
    gracefully to the classical kernel."""
    params = neural_sr.init_params(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(0)
    lo = jax.random.uniform(key, (16, 16, 3), jnp.float32)
    g = {
        "normal": jnp.zeros((16, 16, 3), jnp.float32).at[..., 2].set(1.0),
        "roughness": jnp.full((16, 16), 0.5, jnp.float32),
        "depth": jnp.full((16, 16), 0.25, jnp.float32),
    }
    out = neural_sr.apply(params, lo, g, 32, 32)
    base = jnp.maximum(upscale.lanczos_resize(lo, 32, 32), 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


@pytest.fixture(scope="module")
def kitchen_pair():
    scene = procedural.kitchen()
    ctx, scene = traversal.build_context(scene)
    settings = Settings(sun_elevation=jnp.float32(-30.0),
                       disable_shadows=jnp.int32(1))
    exp = float(settings.exposure) * 1e-2
    out = {}
    for tag, size in (("hi", HI), ("lo", HI // 2)):
        cam = look_at(eye=[2.2, -2.6, 1.7], target=[0.0, 0.5, 0.9],
                      fov_y_deg=60.0)
        cfg = RenderConfig(width=size, height=size, rpp=1, bounce_num=2,
                           tracing_mode=TracingMode.FULL_PROBABILISTIC,
                           denoiser=Denoiser.REFERENCE)
        hist = frame_mod.History.create(cfg)

        @jax.jit
        def step(hist):
            return frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)

        for _ in range(FRAMES):
            o, hist = step(hist)
        out[tag] = np.asarray(
            final_mod.tonemap_output(o["color"].reshape(size, size, 3), exp))
        if tag == "lo":
            gb = o["gbuffer"]
            out["guides"] = {
                "normal": jnp.asarray(gb["normal"]).reshape(size, size, 3),
                "roughness": jnp.asarray(gb["roughness"]).reshape(size, size),
                "depth": jnp.asarray(
                    guides_mod.hw_depth(gb["view_z"], 0.01)).reshape(size, size),
            }
    return out


@pytest.mark.skipif(not os.path.exists(neural_sr.WEIGHTS_PATH),
                    reason="shipped weights absent (run tools/train_neural_sr.py)")
def test_shipped_weights_beat_lanczos_on_held_out_scene(kitchen_pair):
    params = neural_sr.load_weights()
    hi = kitchen_pair["hi"]
    lo = jnp.asarray(kitchen_pair["lo"])

    def psnr(a):
        return -10.0 * np.log10(np.mean((np.asarray(a) - hi) ** 2) + 1e-12)

    p_lz = psnr(upscale.lanczos_resize(lo, HI, HI))
    p_nn = psnr(neural_sr.apply(params, lo, kitchen_pair["guides"], HI, HI))
    assert p_nn > p_lz, f"neural {p_nn:.2f} dB <= lanczos {p_lz:.2f} dB"


@pytest.mark.skipif(not os.path.exists(neural_sr.WEIGHTS_PATH),
                    reason="shipped weights absent (run tools/train_neural_sr.py)")
def test_frame_pipeline_neural_sr_path():
    """use_neural_sr renders through render_frame and actually changes the
    display output vs the Lanczos slot (the wiring is live, not dead)."""
    scene = procedural.cornell_box()
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    settings = Settings()
    outs = {}
    for neural in (False, True):
        cfg = RenderConfig(width=24, height=24, rpp=1, bounce_num=1,
                           tracing_mode=TracingMode.FULL_PROBABILISTIC,
                           denoiser=Denoiser.REFERENCE,
                           output_width=48, output_height=48,
                           enable_post=True, use_neural_sr=neural)
        hist = frame_mod.History.create(cfg)
        o, _ = jax.jit(
            lambda h, c=cfg: frame_mod.render_frame(
                ctx, scene, cam, c, settings, h)
        )(hist)
        assert o["display"].shape == (48, 48, 3)
        assert bool(jnp.all(jnp.isfinite(o["display"])))
        outs[neural] = np.asarray(o["display"])
    assert not np.allclose(outs[False], outs[True])
