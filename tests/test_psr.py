"""PSR mirror-walk G-buffer tests (TraceOpaque.cs.hlsl:569-650).

The reference places the VIRTUAL surface for mirror pixels:
Xvirtual = X0 - V0 * accumulatedHitDist (curvature-corrected), viewZ/MV are
evaluated there, and the normal is unfolded through the inverse mirror matrix —
so camera motion reprojects the reflected image, not the mirror plane.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig, Settings, TracingMode
from nrdsample_tpu.ops import traversal
from nrdsample_tpu.render import trace_opaque
from nrdsample_tpu.scene import camera as cam_mod, procedural
from nrdsample_tpu.scene.types import look_at

W = H = 32


@pytest.fixture(scope="module")
def mirror_setup():
    scene = procedural.mirror_room()
    ctx, scene = traversal.build_context(scene, mode="dense")
    cam = look_at(eye=[0.0, -4.0, 2.5], target=[0.0, 0.0, 0.5],
                  fov_y_deg=45.0, aspect=1.0)
    settings = Settings(sun_elevation=jnp.float32(50.0),
                        disable_shadows=jnp.int32(1))
    return ctx, scene, cam, settings


def _trace(ctx, scene, cam, settings, psr: int):
    cfg = RenderConfig(width=W, height=H, rpp=1, bounce_num=1,
                       tracing_mode=TracingMode.FULL_PROBABILISTIC,
                       denoiser=Denoiser.REFERENCE, psr_bounce_num=psr)
    return trace_opaque.trace_opaque(
        ctx, scene, cam, cfg, settings, jnp.int32(0)
    )


def test_psr_virtual_placement(mirror_setup):
    """Mirror pixels: viewZ/primary_x move to the unfolded virtual point —
    colinear with the camera ray, BEHIND the mirror plane (z<0), and farther
    than the mirror surface."""
    ctx, scene, cam, settings = mirror_setup
    gb0 = _trace(ctx, scene, cam, settings, psr=0)
    gb1 = _trace(ctx, scene, cam, settings, psr=1)

    # mirror pixels = pixels whose viewZ changed when PSR turned on
    vz0 = np.asarray(gb0["view_z"])
    vz1 = np.asarray(gb1["view_z"])
    psr_px = (np.abs(vz1 - vz0) > 1e-3) & np.isfinite(vz0) & np.isfinite(vz1)
    assert psr_px.sum() > 10, "camera setup should see the mirror"

    # virtual surface is FARTHER than the mirror surface
    assert (vz1[psr_px] > vz0[psr_px] + 1e-3).all()

    # Xvirtual: below the mirror plane and colinear with the camera ray
    x_virt = np.asarray(gb1["primary_x"])[psr_px]
    assert (x_virt[:, 2] < 1e-3).all(), "virtual image must be behind z=0"
    eye = np.asarray(cam.view_to_world[:3, 3])
    pix = jnp.arange(W * H, dtype=jnp.int32)
    _, d, _ = cam_mod.camera_rays(cam, W, H, pix, jnp.int32(0))
    d = np.asarray(d)[psr_px.reshape(-1)]
    off = x_virt - eye
    off = off / np.linalg.norm(off, axis=-1, keepdims=True)
    assert (np.abs(np.cross(off, d)).max() < 1e-3), "Xvirtual off the camera ray"


def test_psr_normal_unfolded(mirror_setup):
    """Pixels reflecting the box BOTTOM (true normal (0,0,-1)) must export the
    unfolded normal (0,0,+1) through the inverse mirror matrix."""
    ctx, scene, cam, settings = mirror_setup
    gb1 = _trace(ctx, scene, cam, settings, psr=1)
    gb0 = _trace(ctx, scene, cam, settings, psr=0)
    vz0, vz1 = np.asarray(gb0["view_z"]), np.asarray(gb1["view_z"])
    psr_px = (np.abs(vz1 - vz0) > 1e-3) & np.isfinite(vz1)
    n1 = np.asarray(gb1["normal"])
    # reflected box-bottom pixels: virtual point inside the box footprint
    x_virt = np.asarray(gb1["primary_x"])
    bottom = psr_px & (np.abs(x_virt[:, 0]) < 0.45) & (np.abs(x_virt[:, 1]) < 0.45) \
        & (x_virt[:, 2] < -0.5)
    assert bottom.sum() > 4
    assert (n1[bottom, 2] > 0.9).all(), \
        "box-bottom normal must be unfolded to +z, not raw -z"


def test_psr_motion_reprojects_virtual_image(mirror_setup):
    """With camera motion, the exported MV at mirror pixels must equal the
    reprojection of the VIRTUAL point (computed independently from viewZ and
    the camera ray), not of the mirror surface."""
    import dataclasses

    ctx, scene, cam, settings = mirror_setup
    # prev camera displaced sideways
    prev = look_at(eye=[0.4, -4.0, 2.5], target=[0.0, 0.0, 0.5],
                   fov_y_deg=45.0, aspect=1.0)
    cam_moved = dataclasses.replace(cam, view_to_world_prev=prev.view_to_world)

    gb0 = _trace(ctx, scene, cam_moved, settings, psr=0)
    gb1 = _trace(ctx, scene, cam_moved, settings, psr=1)
    vz0, vz1 = np.asarray(gb0["view_z"]), np.asarray(gb1["view_z"])
    psr_px = (np.abs(vz1 - vz0) > 1e-3) & np.isfinite(vz1)
    assert psr_px.sum() > 10

    # reconstruct Xvirtual independently: eye + dir * s with s from viewZ
    pix = jnp.arange(W * H, dtype=jnp.int32)
    o, d, _ = cam_mod.camera_rays(cam_moved, W, H, pix, jnp.int32(0))
    w2v = np.asarray(cam_moved.world_to_view)
    d_np = np.asarray(d)
    dz_view = d_np @ w2v[:3, :3].T  # view-space ray dirs
    s = vz1.reshape(-1) / np.maximum(dz_view[:, 2], 1e-6)
    x_virt = np.asarray(o) + d_np * s[:, None]

    mv_expect = np.asarray(cam_mod.get_motion(
        cam_moved, jnp.asarray(x_virt), jnp.asarray(x_virt), W, H
    ))
    mv_got = np.asarray(gb1["mv"])
    err = np.abs(mv_got[psr_px][:, :2] - mv_expect[psr_px][:, :2])
    assert err.max() < 0.1, f"mirror-pixel MV must track the virtual image ({err.max()})"

    # and it must DIFFER from the mirror-surface reprojection
    mv_surface = np.asarray(gb0["mv"])
    assert np.abs(mv_got[psr_px][:, :2] - mv_surface[psr_px][:, :2]).max() > 0.5
