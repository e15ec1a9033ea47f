"""REBLUR specular virtual-motion reprojection (NRDSample.cpp:563-585 —
GetDefaultReblurSettings enables virtual-history reprojection; behavioral
model: mirror reflections reproject at the virtual image X + V*hitT, not at
the reflector surface)."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from nrdsample_tpu.denoise import reblur
from nrdsample_tpu.scene import camera as cam_mod
from nrdsample_tpu.scene.types import look_at


def _two_frame_cam(eye_prev, eye_cur, target=(0.0, 0.0, 0.0)):
    prev = look_at(eye=list(eye_prev), target=list(target), fov_y_deg=60.0)
    cur = look_at(eye=list(eye_cur), target=list(target), fov_y_deg=60.0)
    return dataclasses.replace(cur, view_to_world_prev=prev.view_to_world)


def _planes(cam, w, h, depth, hitdist):
    """Primary hit plane at constant forward depth plus per-pixel view dirs."""
    pix = jnp.arange(w * h, dtype=jnp.int32)
    o, d, _ = cam_mod.camera_rays(cam, w, h, pix, jnp.int32(0))
    vz = jnp.einsum("ij,...j->...i", cam.world_to_view[:3, :3], d)[..., 2]
    t = depth / vz
    x = (o + d * t[:, None]).reshape(h, w, 3)
    vdir = d.reshape(h, w, 3)
    hd = jnp.full((h, w), hitdist, jnp.float32)
    return x, vdir, hd


def test_mirror_uses_virtual_parallax():
    """Sideways camera translation: a mirror's reflection of a distant object
    has LESS screen-space parallax than the mirror surface itself (the virtual
    image sits deeper). r=0 must track the virtual point exactly."""
    w = h = 16
    cam = _two_frame_cam((0.4, -5.0, 0.0), (0.0, -5.0, 0.0))
    x, vdir, hd = _planes(cam, w, h, depth=2.0, hitdist=20.0)

    # surface motion for static geometry
    mv = cam_mod.get_motion(cam, x, x, w, h)
    rough0 = jnp.zeros((h, w), jnp.float32)
    mv_spec = reblur.specular_virtual_mv(cam, x, vdir, hd, rough0, mv, w, h)

    # exact virtual point for r=0: amount = 1
    xv = x + vdir * hd[..., None]
    uv_prev = cam_mod.world_to_uv(cam, xv, prev=True)
    uv_cur = cam_mod.world_to_uv(cam, x, prev=False)
    expected = (uv_prev - uv_cur) * jnp.array([w, h], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mv_spec[..., :2]), np.asarray(expected), atol=1e-4
    )
    # virtual parallax is strictly smaller than surface parallax
    assert float(jnp.abs(mv_spec[..., 0]).mean()) < float(
        jnp.abs(mv[..., 0]).mean()
    )
    # z stays surface-based (disocclusion test input)
    np.testing.assert_allclose(
        np.asarray(mv_spec[..., 2]), np.asarray(mv[..., 2]), atol=1e-6
    )


def test_rough_falls_back_to_surface_mv():
    w = h = 8
    cam = _two_frame_cam((0.4, -5.0, 0.0), (0.0, -5.0, 0.0))
    x, vdir, hd = _planes(cam, w, h, depth=2.0, hitdist=20.0)
    mv = cam_mod.get_motion(cam, x, x, w, h)
    rough1 = jnp.ones((h, w), jnp.float32)
    mv_spec = reblur.specular_virtual_mv(cam, x, vdir, hd, rough1, mv, w, h)
    np.testing.assert_allclose(
        np.asarray(mv_spec), np.asarray(mv), atol=1e-5
    )


def test_static_camera_zero_motion():
    w = h = 8
    cam = _two_frame_cam((0.0, -5.0, 0.0), (0.0, -5.0, 0.0))
    x, vdir, hd = _planes(cam, w, h, depth=2.0, hitdist=5.0)
    mv = cam_mod.get_motion(cam, x, x, w, h)
    for r in (0.0, 0.3, 1.0):
        mv_spec = reblur.specular_virtual_mv(
            cam, x, vdir, hd, jnp.full((h, w), r, jnp.float32), mv, w, h
        )
        np.testing.assert_allclose(np.asarray(mv_spec), 0.0, atol=1e-4)
