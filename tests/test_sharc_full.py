"""SHARC FULL through-glass probes + dynamic-object gradient heuristic.

Reference: SharcUpdate.cs.hlsl:46,232 (FULL mode jumps delta events so the
cache populates through/behind glass) and :181-193 (static-origin ->
dynamic-hit segments inject an AO-style hitT term into the confidence
gradient). VERDICT r3 missing #2.
"""

import numpy as np
import jax.numpy as jnp

from nrdsample_tpu import config as cfgmod
from nrdsample_tpu.config import RenderConfig, Settings
from nrdsample_tpu.mathlib import color
from nrdsample_tpu.ops import sharc, traversal
from nrdsample_tpu.render import sharc_update
from nrdsample_tpu.scene import procedural
from nrdsample_tpu.scene.types import look_at


def _mirror_pocket_scene():
    """A 45-degree high-IOR glass pane in front of the camera; the ONLY opaque
    geometry is a ceiling pocket reachable exclusively via the reflected ray.
    CURR probes (opaque-only primary) hit nothing; FULL probes reflect up off
    the glass and land on the pocket."""
    # pane: plane y = z (normal (0,-1,1)/sqrt2), spanning x,z in [-3,3]
    s = 3.0
    v = np.array([[-s, -s, -s], [s, -s, -s], [s, s, s], [-s, s, s]], np.float32)
    i = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    ceil_v, ceil_i = procedural.make_plane([0, 0, 4.0], [6.0, 6.0])
    parts = [(ceil_v, ceil_i, None, 0), (v, i, None, 1)]
    mats = {
        "base_color": [[0.8, 0.8, 0.8], [1.0, 1.0, 1.0]],
        "metalness": [0.0, 0.0],
        "roughness": [0.8, 0.0],
        "emission": [[0, 0, 0], [0, 0, 0]],
        # high IOR -> Fresnel reflectance ~0.7 at normal incidence, so most
        # FULL lanes take the reflection branch deterministically enough
        "ior": [1.5, 12.0],
        "flags": [cfgmod.FLAG_NON_TRANSPARENT | cfgmod.FLAG_STATIC,
                  cfgmod.FLAG_TRANSPARENT | cfgmod.FLAG_STATIC],
    }
    return procedural._assemble(parts, mats)


def _run_update(scene, cfg, cam):
    ctxs, scene = traversal.build_scene_contexts(scene)
    settings = Settings(sun_elevation=jnp.float32(45.0))
    state = sharc.SharcState.create(cfg.sharc_capacity, cfg.dtype)
    state, probes = sharc_update.sharc_update_pass(
        ctxs, scene, cam, cfg, settings, jnp.int32(3), state
    )
    return state, probes, scene


def test_full_mode_populates_cache_through_glass():
    scene = _mirror_pocket_scene()
    cam = look_at(eye=[0.0, -4.0, 0.0], target=[0.0, 4.0, 0.0], fov_y_deg=25.0)
    base = dict(width=60, height=60, rpp=1, bounce_num=1, use_sharc=True,
                sharc_capacity=1 << 14)
    cfg_off = RenderConfig(sharc_full_mode=False, **base)
    cfg_on = RenderConfig(sharc_full_mode=True, **base)
    state_off, _, _ = _run_update(scene, cfg_off, cam)
    state_on, _, scene_d = _run_update(scene, cfg_on, cam)
    n_off = int((np.asarray(state_off.keys) != 0).sum())
    n_on = int((np.asarray(state_on.keys) != 0).sum())
    # CURR probes see no opaque geometry at all -> empty cache; FULL probes
    # reflect off the pane and populate the pocket
    assert n_off == 0
    assert n_on > 20
    # entries are queryable AT the pocket (behind/through the glass event)
    gx = np.linspace(-1.2, 1.2, 12, dtype=np.float32)
    gy = np.linspace(-1.2, 1.2, 12, dtype=np.float32)
    px, py = np.meshgrid(gx, gy)
    pos = jnp.asarray(
        np.stack([px.ravel(), py.ravel(), np.full(px.size, 4.0)], -1)
    )
    cam_pos = jnp.asarray([0.0, -4.0, 0.0])
    found_any = np.zeros(pos.shape[0], bool)
    for zq in (3.95, 4.0):  # straddle the voxel boundary at the ceiling plane
        posq = pos.at[:, 2].set(zq)
        for nz in (-1.0, 1.0):
            n = jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, nz], jnp.float32), pos.shape
            )
            _, found = sharc.query(state_on, posq, n, cam_pos)
            found_any |= np.asarray(found)
    assert found_any.sum() > 10


def _blocker_scene(blocker_static: bool):
    floor_v, floor_i = procedural.make_plane([0, 0, 0], [20.0, 20.0])
    box_v, box_i = procedural.make_box([0, 0, 1.0], [8.0, 8.0, 0.2])
    bflags = cfgmod.FLAG_NON_TRANSPARENT | (
        cfgmod.FLAG_STATIC if blocker_static else 0
    )
    parts = [(floor_v, floor_i, None, 0), (box_v, box_i, None, 1)]
    mats = {
        "base_color": [[0.7, 0.7, 0.7], [0.6, 0.6, 0.6]],
        "metalness": [0.0, 0.0],
        "roughness": [0.9, 0.9],
        "emission": [[0, 0, 0], [0, 0, 0]],
        "ior": [1.5, 1.5],
        "flags": [cfgmod.FLAG_NON_TRANSPARENT | cfgmod.FLAG_STATIC, bflags],
    }
    return procedural._assemble(parts, mats)


def test_dynamic_object_gradient_term():
    """A non-FLAG_STATIC blocker hanging over a static floor injects the
    indirect-shadow term into grad_lum; the identical static scene does not
    (SharcUpdate.cs.hlsl:189: `indirectShadowing *= isStaticAtOrigin &&
    isDynamicAtHit`)."""
    # grazing camera: primary rays pass UNDER the hanging box and land on the
    # floor beneath it, so floor->underside bounce segments are common
    cam = look_at(eye=[0.0, -6.0, 1.5], target=[0.0, 2.0, -0.9], fov_y_deg=25.0)
    cfg = RenderConfig(width=40, height=40, rpp=1, bounce_num=1,
                       use_sharc=True, sharc_capacity=1 << 14)
    _, probes_dyn, _ = _run_update(_blocker_scene(False), cfg, cam)
    _, probes_sta, _ = _run_update(_blocker_scene(True), cfg, cam)
    base_dyn = np.asarray(color.luminance(probes_dyn["radiance"]))
    grad_dyn = np.asarray(probes_dyn["grad_lum"])
    base_sta = np.asarray(color.luminance(probes_sta["radiance"]))
    grad_sta = np.asarray(probes_sta["grad_lum"])
    # static scene: grad_lum is exactly the radiance luminance (term = 0)
    np.testing.assert_allclose(grad_sta, base_sta, rtol=1e-6, atol=1e-6)
    # dynamic blocker: camera sees the blocker top (static->dynamic segments
    # happen under it via floor bounces) OR probe origins on the floor whose
    # bounce hits the blocker underside pick up the hitT term
    extra = grad_dyn - base_dyn
    assert (extra >= -1e-6).all()
    assert (extra > 0.1).sum() > 3
