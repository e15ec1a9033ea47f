"""Differentiability tests (SURVEY.md §4 implications (c), BASELINE.md):
autodiff gradients of the rendered image w.r.t. scene parameters must match
finite differences, and inverse rendering must converge."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod, train as train_mod
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

RES = 32


@pytest.fixture(scope="module")
def setup():
    scene = procedural.cornell_box()
    # FD-vs-autodiff must be evaluated away from parameter clamps (roughness is
    # clipped to [0,1], so the classic roughness=1.0 sits on a boundary where
    # central differences are asymmetric)
    rough = np.array(scene.materials.roughness, np.float32)
    rough[4] = 0.55
    scene = dataclasses.replace(
        scene,
        materials=dataclasses.replace(scene.materials, roughness=rough),
    )
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    cfg = RenderConfig(
        width=RES, height=RES, rpp=1, bounce_num=2,
        tracing_mode=TracingMode.FULL_PROBABILISTIC, denoiser=Denoiser.REFERENCE,
        importance_samples=4,
    )
    settings = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
    return ctx, scene, cam, cfg, settings


def _loss_of_param(setup_t, field, idx, value=None):
    """Scalar image loss as a function of one material parameter entry."""
    ctx, scene, cam, cfg, settings = setup_t

    def loss(v):
        mats = scene.materials
        arr = getattr(mats, field)
        arr = arr.at[idx].set(v) if value is None else arr
        mats2 = dataclasses.replace(mats, **{field: arr})
        scene2 = dataclasses.replace(scene, materials=mats2)
        hist = frame_mod.History.create(cfg)
        out, _ = frame_mod.render_frame(ctx, scene2, cam, cfg, settings, hist)
        return jnp.sum(out["color"])

    return loss


class TestFiniteDifference:
    @pytest.mark.parametrize(
        "field,idx",
        [
            ("emission", (3, 0)),     # light red emission
            ("base_color", (1, 0)),   # red wall albedo
            ("roughness", (4,)),      # box roughness
        ],
    )
    def test_grad_matches_fd(self, setup, field, idx):
        loss = _loss_of_param(setup, field, idx)
        mats = setup[1].materials
        v0 = jnp.asarray(getattr(mats, field))[idx]
        g_auto = float(jax.grad(loss)(v0))
        eps = 3e-3
        g_fd = float((loss(v0 + eps) - loss(v0 - eps)) / (2 * eps))
        # MC sampling is identical across evals (same RNG), so FD is exact up to
        # smoothness of the detached decisions
        assert g_auto == pytest.approx(g_fd, rel=0.08, abs=0.6), (
            f"{field}{idx}: auto {g_auto} vs fd {g_fd}"
        )

    def test_emission_grad_positive(self, setup):
        # brighter light must increase total image energy
        loss = _loss_of_param(setup, "emission", (3, 1))
        mats = setup[1].materials
        g = float(jax.grad(loss)(jnp.asarray(mats.emission)[3, 1]))
        assert g > 0.0

    def test_sun_elevation_grad_flows(self, setup):
        ctx, scene, cam, cfg, _ = setup

        def loss(elev):
            settings = Settings(sun_elevation=elev, disable_shadows=jnp.int32(1))
            hist = frame_mod.History.create(cfg)
            out, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
            return jnp.sum(out["color"])

        g = float(jax.grad(loss)(jnp.float32(-30.0)))
        assert np.isfinite(g)


class TestInverseRendering:
    def test_albedo_optimization_converges(self, setup):
        """Optimize the red wall's albedo to match a render made with a known
        different albedo — the BASELINE config-5 'differentiable material
        optimization' in miniature."""
        ctx, scene, cam, cfg, settings = setup
        # target render: red wall turned blue-ish
        target_mats = dataclasses.replace(
            scene.materials,
            base_color=scene.materials.base_color.at[1].set(
                jnp.array([0.1, 0.2, 0.7])
            ),
        )
        target_scene = dataclasses.replace(scene, materials=target_mats)
        hist = frame_mod.History.create(cfg)
        target, _ = frame_mod.render_frame(ctx, target_scene, cam, cfg, settings, hist)
        target = jax.lax.stop_gradient(target["color"])

        step = train_mod.make_train_step(ctx, cfg, lr=2e-4)
        mats = scene.materials
        losses = []
        for i in range(24):
            hist = frame_mod.History.create(cfg)
            loss, mats = step(mats, scene, cam, settings, hist, target)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.35, losses[::6]
        got = np.asarray(mats.base_color[1])
        want = np.array([0.1, 0.2, 0.7])
        start = np.array([0.611, 0.056, 0.062])
        # moved decisively toward the target
        assert np.abs(got - want).sum() < 0.6 * np.abs(start - want).sum()
