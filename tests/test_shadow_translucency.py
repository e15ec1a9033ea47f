"""Shadow-translucency march — multi-layer tinted glass shadows.

Reference semantics: TraceOpaque.cs.hlsl:780-798 (the sun-shadow ray marches
hit-to-hit through glass, each layer multiplying translucency by
lerp(0.9, 0, pow01(1-NoV, 2.5))) and Composition.cs.hlsl:58-64 (SIGMA's
translucency is RGB). VERDICT r3 missing #3.
"""

import numpy as np
import jax.numpy as jnp

from nrdsample_tpu import config as cfgmod
from nrdsample_tpu.config import Denoiser, RenderConfig, Settings
from nrdsample_tpu.mathlib import color
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.pipeline import frame as frame_mod
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at

GLASS_TINT = np.array([0.5, 0.8, 1.0], np.float32)


def _two_pane_scene(pane_size=100.0):
    """White floor at z=0, two huge tinted glass panes at z=1 and z=2."""
    floor_v, floor_i = procedural.make_plane([0, 0, 0], [pane_size, pane_size])
    p1_v, p1_i = procedural.make_plane([0, 0, 1.0], [pane_size, pane_size])
    p2_v, p2_i = procedural.make_plane([0, 0, 2.0], [pane_size, pane_size])
    parts = [
        (floor_v, floor_i, None, 0),
        (p1_v, p1_i, None, 1),
        (p2_v, p2_i, None, 1),
    ]
    mats = {
        "base_color": [[0.8, 0.8, 0.8], GLASS_TINT.tolist()],
        "metalness": [0.0, 0.0],
        "roughness": [0.5, 0.0],
        "emission": [[0, 0, 0], [0, 0, 0]],
        "ior": [1.5, 1.5],
        "flags": [cfgmod.FLAG_NON_TRANSPARENT, cfgmod.FLAG_TRANSPARENT],
    }
    return procedural._assemble(parts, mats)


def test_march_two_panes_analytic():
    """Straight-up rays through two normal-incidence panes: translucency is
    exactly (0.9 * tint)^2 and the penumbra distance is the first pane hit."""
    scene = _two_pane_scene()
    ctxs, scene = traversal.build_scene_contexts(scene)
    assert ctxs.transparent is not None
    cfg = RenderConfig(width=4, height=4, rpp=1, bounce_num=1)
    n = 8
    sxo = jnp.asarray(
        np.stack([np.linspace(-2, 2, n), np.zeros(n), np.full(n, 0.1)], -1),
        jnp.float32,
    )
    sdir = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    trans, first_t = frame_mod._shadow_translucency_march(
        ctxs.transparent, scene, cfg, sxo, sdir
    )
    expect = (0.9 * GLASS_TINT) ** 2  # NoV = 1 -> factor 0.9 per layer
    np.testing.assert_allclose(np.asarray(trans), np.tile(expect, (n, 1)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(first_t), np.full(n, 0.9),
                               rtol=1e-4, atol=1e-3)


def test_march_grazing_blocks_more():
    """The NoV term: a grazing-incidence layer transmits less than a normal
    one (pow01(1-NoV, 2.5) pushes the lerp toward 0)."""
    scene = _two_pane_scene()
    ctxs, scene = traversal.build_scene_contexts(scene)
    cfg = RenderConfig(width=4, height=4, rpp=1, bounce_num=1)
    sxo = jnp.asarray([[0.0, 0.0, 0.1], [0.0, 0.0, 0.1]], jnp.float32)
    g = np.array([0.0, 0.98, 0.199], np.float32)  # grazing: NoV ~ 0.2
    g /= np.linalg.norm(g)
    sdir = jnp.asarray(np.stack([[0, 0, 1], g]), jnp.float32)
    trans, _ = frame_mod._shadow_translucency_march(
        ctxs.transparent, scene, cfg, sxo, sdir
    )
    t = np.asarray(color.luminance(trans))
    assert t[1] < t[0] * 0.7
    # analytic: per-layer factor 0.9 * (1 - (1-NoV)^2.5)
    nov = g[2]
    f = 0.9 * (1.0 - (1.0 - nov) ** 2.5)
    expect = (f * GLASS_TINT) ** 2
    np.testing.assert_allclose(np.asarray(trans[1]), expect, rtol=1e-3, atol=1e-4)


def test_frame_tinted_partial_shadow():
    """End-to-end trace_frame: floor pixels under two panes carry a partial,
    TINTED shadow (scalar = luminance, shadow_tint = chroma), and the SIGMA
    penumbra distance sees the closest pane."""
    scene = _two_pane_scene()
    ctxs, scene = traversal.build_scene_contexts(scene)
    cam = look_at(eye=[0.0, -2.5, 4.0], target=[0.0, 0.0, 0.0], fov_y_deg=40.0)
    cfg = RenderConfig(width=16, height=16, rpp=1, bounce_num=1,
                       denoiser=Denoiser.REFERENCE)
    settings = Settings(sun_elevation=jnp.float32(90.0))
    hist = frame_mod.History.create(cfg)
    gb, _ = frame_mod.trace_frame(ctxs, scene, cam, cfg, settings, hist)
    shadow = np.asarray(gb["shadow"])
    tint = np.asarray(gb["shadow_tint"])
    hd = np.asarray(gb["shadow_hit_dist"])
    miss = np.asarray(gb["miss"])
    on_floor = ~miss
    assert on_floor.sum() > 50
    trans_expect = (0.9 * GLASS_TINT) ** 2
    lum_expect = float(np.asarray(color.luminance(jnp.asarray(trans_expect))))
    # partial shadow at the luminance of the two-pane transmission (small
    # spread from the sun-disc jitter on NoV)
    np.testing.assert_allclose(shadow[on_floor], lum_expect, rtol=0.02)
    tint_expect = trans_expect / lum_expect
    np.testing.assert_allclose(
        tint[on_floor], np.tile(tint_expect, (on_floor.sum(), 1)), rtol=0.02
    )
    # closest blocker = first pane, ~1 unit above the floor
    assert (hd[on_floor] > 0.5).all() and (hd[on_floor] < 1.5).all()


def test_compose_applies_tint():
    """composition.compose re-tints the denoised scalar shadow with the glass
    chroma (Composition.cs.hlsl:58-64 RGB unpack)."""
    from nrdsample_tpu.denoise import composition

    n = 4
    gb = {
        "direct_lighting": jnp.ones((n, 3)),
        "emission": jnp.zeros((n, 3)),
        "diff_factor": jnp.zeros((n, 3)),
        "spec_factor": jnp.zeros((n, 3)),
        "shadow_tint": jnp.broadcast_to(
            jnp.asarray([2.0, 1.0, 0.5], jnp.float32), (n, 3)
        ),
    }
    zero = jnp.zeros((n, 3))
    out = composition.compose(gb, zero, zero, jnp.full((n,), 0.5))
    np.testing.assert_allclose(np.asarray(out),
                               np.tile([1.0, 0.5, 0.25], (n, 1)), rtol=1e-6)
    gb.pop("shadow_tint")
    out = composition.compose(gb, zero, zero, jnp.full((n,), 0.5))
    np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-6)
