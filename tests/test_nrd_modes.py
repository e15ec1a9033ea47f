"""NRD_MODE variants: OCCLUSION, DIRECTIONAL_OCCLUSION, SH.

Reference: Shared.hlsli:52-55 mode switch, NRDSample.cpp:871-922 denoiser
variant selection, Composition.cs.hlsl:83-168 per-mode unpack.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.config import Denoiser, NrdMode, RenderConfig, Settings, TracingMode
from nrdsample_tpu.denoise import occlusion as occl
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

RES = 32


def _render(nrd_mode, denoiser=Denoiser.RELAX):
    scene = procedural.cornell_box()
    ctx, scene = traversal.build_context(scene)
    cam = look_at(eye=[0.0, -3.2, 1.0], target=[0.0, 0.0, 1.0], fov_y_deg=39.0)
    cfg = RenderConfig(
        width=RES, height=RES, rpp=1, bounce_num=1,
        tracing_mode=TracingMode.FULL_PROBABILISTIC,
        denoiser=denoiser, nrd_mode=nrd_mode,
    )
    settings = Settings(sun_elevation=jnp.float32(-30.0), disable_shadows=jnp.int32(1))
    hist = frame_mod.History.create(cfg)
    out, _ = frame_mod.render_frame(ctx, scene, cam, cfg, settings, hist)
    return out


def test_norm_hitdist_monotone():
    hd = jnp.asarray([0.0, 1.0, 5.0])
    vz = jnp.full((3,), 2.0)
    n = np.asarray(occl.norm_hitdist(hd, vz))
    assert n[0] == 0.0 and n[1] < n[2]


def test_occlusion_mode_renders_ao():
    out = _render(NrdMode.OCCLUSION)
    img = np.asarray(out["color"]).reshape(RES, RES, 3)
    assert np.isfinite(img).all()
    occ = np.asarray(out["diff_radiance"])  # replaced by occlusion planes
    assert occ.min() >= 0.0 and occ.max() <= 1.0 + 1e-5
    # corners (concave) should be more occluded than the open floor center:
    # just require variation, not a specific layout
    assert occ.std() > 1e-3


def test_directional_occlusion_differs_from_plain():
    o1 = np.asarray(_render(NrdMode.OCCLUSION)["color"])
    o2 = np.asarray(_render(NrdMode.DIRECTIONAL_OCCLUSION)["color"])
    assert np.isfinite(o2).all()
    assert not np.allclose(o1, o2)


def test_sh_mode_finite_and_directional():
    out = _render(NrdMode.SH)
    img = np.asarray(out["color"])
    assert np.isfinite(img).all()
    # sh guide planes present
    assert out["gbuffer"]["diff_dir"].shape == (RES * RES, 3)


def test_sh_resolve_boosts_aligned_direction():
    from nrdsample_tpu.denoise import sh as sh_mod

    n = jnp.asarray([[0.0, 0.0, 1.0]])
    rad = jnp.asarray([[1.0, 1.0, 1.0]])
    up = sh_mod.resolve({"radiance": rad, "dir": jnp.asarray([[0.0, 0.0, 1.0]])}, n)
    dn = sh_mod.resolve({"radiance": rad, "dir": jnp.asarray([[0.0, 0.0, -1.0]])}, n)
    assert float(up[0, 0]) > float(dn[0, 0])
