"""Replay the shipped Tests/*.json settings+camera records — the Tests/*.bin
regression mechanism (SURVEY.md §4.1): each record renders without error and
the curated CHECK_ME records render deterministically (replay twice, identical
output — the whole frame is a pure function of (record, frame index))."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod, records
from nrdsample_tpu.scene import procedural

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = 32

SCENES = {
    "cornellbox": procedural.cornell_box,
    "kitchen": procedural.kitchen,
    "shaderballs": lambda: procedural.shader_balls(grid=2, sphere_res=12),
    "interior-night": lambda: procedural.interior_night(n_lights=8, grid=2,
                                                        sphere_res=10),
}


def _record_ids():
    out = []
    for scene in SCENES:
        path = os.path.join(REPO, "Tests", f"{scene}.json")
        for i in range(records.count_records(path)):
            out.append((scene, i))
    return out


@pytest.fixture(scope="module")
def contexts():
    return {name: traversal.build_context(fn()) for name, fn in SCENES.items()}


@pytest.mark.parametrize("scene_name,index", _record_ids())
def test_record_renders(contexts, scene_name, index):
    path = os.path.join(REPO, "Tests", f"{scene_name}.json")
    settings, cam = records.load_record(path, index)
    ctx, scene = contexts[scene_name]
    cfg = RenderConfig(
        width=RES, height=RES, rpp=1, bounce_num=1,
        tracing_mode=TracingMode.FULL_PROBABILISTIC,
        denoiser=Denoiser.REFERENCE,
    )
    out, _ = frame_mod.render_frame(
        ctx, scene, cam, cfg, settings, frame_mod.History.create(cfg),
        reset_history=True,  # forced history reset on record load
    )
    img = np.asarray(out["color"])
    assert np.isfinite(img).all()
    assert img.max() > 0.0


@pytest.mark.parametrize("index", records.CHECK_ME.get("cornellbox", []))
def test_check_me_deterministic(contexts, index):
    """checkMe records are the regression-sensitive set: the replay must be
    bit-deterministic (failure recovery story, SURVEY.md §5.3)."""
    path = os.path.join(REPO, "Tests", "cornellbox.json")
    settings, cam = records.load_record(path, index)
    ctx, scene = contexts["cornellbox"]
    cfg = RenderConfig(width=RES, height=RES, rpp=1, bounce_num=1,
                       tracing_mode=TracingMode.FULL_PROBABILISTIC,
                       denoiser=Denoiser.REFERENCE)

    def render():
        out, _ = frame_mod.render_frame(
            ctx, scene, cam, cfg, settings, frame_mod.History.create(cfg)
        )
        return np.asarray(out["color"])

    a = render()
    b = render()
    np.testing.assert_array_equal(a, b)
