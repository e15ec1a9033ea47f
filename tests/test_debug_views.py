"""SHARC/TAA debug views + NRD validation overlay (VERDICT r4 missing #6;
USE_SHARC_DEBUG TraceOpaque.cs.hlsl:117-154, USE_TAA_DEBUG + gValidation
Final.cs.hlsl:46-56)."""

import numpy as np
import jax.numpy as jnp

from nrdsample_tpu.config import (
    Denoiser, OnScreen, RenderConfig, Settings, TracingMode,
)
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

RES = 32


def _render(cfg, n_frames=2):
    scene = procedural.cornell_box()
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    s = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
    hist = frame_mod.History.create(cfg)
    out = None
    for _ in range(n_frames):
        out, hist = frame_mod.render_frame(ctx, scene, cam, cfg, s, hist)
    return out


def _cfg(**kw):
    kw.setdefault("tracing_mode", TracingMode.FULL_PROBABILISTIC)
    kw.setdefault("denoiser", Denoiser.RELAX)
    return RenderConfig(width=RES, height=RES, rpp=1, bounce_num=1, **kw)


class TestSharcDebugViews:
    def test_sharc_cache_view(self):
        out = _render(_cfg(use_sharc=True, sharc_capacity=1 << 14,
                           on_screen=OnScreen.SHARC_CACHE), n_frames=3)
        dbg = np.asarray(out["debug"])
        assert dbg.shape[-1] == 3 and np.isfinite(dbg).all()
        # after warmup some cells resolve (non-red) and some may be invalid;
        # the view must not be uniformly the red invalid marker
        red = (dbg[..., 0] > 0.99) & (dbg[..., 1] == 0.0) & (dbg[..., 2] == 0.0)
        assert not red.all()

    def test_sharc_grid_view_quantized(self):
        out = _render(_cfg(use_sharc=True, sharc_capacity=1 << 14,
                           on_screen=OnScreen.SHARC_GRID))
        dbg = np.asarray(out["debug"])
        # colored hash: piecewise-constant over voxels -> far fewer unique
        # colors than pixels, but more than a handful of cells on screen
        uniq = len(np.unique(dbg.reshape(-1, 3), axis=0))
        assert 4 < uniq < dbg.shape[0] * 0.9

    def test_taa_weight_view(self):
        out = _render(_cfg(use_taa=True, on_screen=OnScreen.TAA_WEIGHT),
                      n_frames=3)
        dbg = np.asarray(out["debug"])
        assert np.isfinite(dbg).all()
        assert 0.0 <= dbg.min() and dbg.max() <= 1.0
        # steady frame: most pixels near base_mix, not the reset value 1.0
        assert np.mean(dbg[..., 0] < 0.9) > 0.5


class TestValidationOverlay:
    def test_overlay_blends_heatmap(self):
        out_v = _render(_cfg(use_taa=True, use_validation_overlay=True))
        out_p = _render(_cfg(use_taa=True))
        fv, fp = np.asarray(out_v["final"]), np.asarray(out_p["final"])
        assert fv.shape == fp.shape
        assert np.abs(fv - fp).mean() > 1e-3   # overlay visibly changes final
        # frame 2 everywhere-valid history: green (converged-ish) channel
        # contribution present, overlay bounded
        assert np.isfinite(fv).all()
