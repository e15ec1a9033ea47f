"""RR-slot learned denoiser: held-out quality gate.

VERDICT r3 #10 done-criterion: PSNR above the RELAX output on a held-out
scene at equal rpp. The kitchen view was excluded from training
(tools/train_neural_rr.py HOLDOUT); its converged REFERENCE target ships in
Tests/golden/neural_rr_holdout.npz. Both pipelines render the identical
2-frame sequence (1 rpp, 2 bounces) and are scored against the target.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod, replay
from nrdsample_tpu.post import neural_rr
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

RES = 96
HOLDOUT_PATH = os.path.join(replay.GOLDEN_DIR, "neural_rr_holdout.npz")


def _psnr(a, target):
    a = np.clip(np.asarray(a), 0, 4)
    t = np.clip(np.asarray(target), 0, 4)
    return -10 * np.log10(np.mean((a - t) ** 2) + 1e-12)


@pytest.fixture(scope="module")
def setup():
    assert os.path.exists(HOLDOUT_PATH), "run tools/train_neural_rr.py"
    target = np.load(HOLDOUT_PATH)["target"]
    scene = procedural.kitchen()
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -1.6, 1.6], target=[0.0, 1.5, 1.2], fov_y_deg=65.0)
    settings = Settings(sun_elevation=jnp.float32(45.0))
    return target, ctx, scene, cam, settings


def _render(denoiser, ctx, scene, cam, settings, frames=2):
    cfg = RenderConfig(width=RES, height=RES, rpp=1, bounce_num=2,
                       tracing_mode=TracingMode.FULL_PROBABILISTIC,
                       denoiser=denoiser)
    hist = frame_mod.History.create(cfg)
    out = None
    for _ in range(frames):
        out, hist = jax.jit(
            lambda s, c, st, h: frame_mod.render_frame(ctx, s, c, cfg, st, h)
        )(scene, cam, settings, hist)
    return np.asarray(out["color"]).reshape(RES, RES, 3)


def test_weights_ship():
    assert neural_rr.load_weights() is not None


def test_neural_beats_relax_on_holdout(setup):
    target, ctx, scene, cam, settings = setup
    img_nn = _render(Denoiser.NEURAL, ctx, scene, cam, settings)
    img_rx = _render(Denoiser.RELAX, ctx, scene, cam, settings)
    p_nn = _psnr(img_nn, target)
    p_rx = _psnr(img_rx, target)
    assert np.isfinite(img_nn).all()
    # the done-criterion: learned RR > RELAX at equal rpp on the held-out view
    assert p_nn > p_rx, f"neural {p_nn:.2f} dB <= relax {p_rx:.2f} dB"


def test_recurrent_history_improves(setup):
    """More recurrent frames must not degrade quality (the temporal input is
    being used, not ignored)."""
    target, ctx, scene, cam, settings = setup
    one = _psnr(_render(Denoiser.NEURAL, ctx, scene, cam, settings, frames=1),
                target)
    four = _psnr(_render(Denoiser.NEURAL, ctx, scene, cam, settings, frames=4),
                 target)
    assert four > one - 0.5, (one, four)
