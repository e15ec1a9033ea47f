"""Animation drivers — AnimatedInstance orbits, sun animation, camera motion.

Reference (SURVEY.md §2.1 "Animation" row):
  * ``AnimatedInstance::Animate`` (NRDSample.cpp:314-332): each animated cube
    orbits on a randomized ellipse with its own period/phase/axis and spins;
  * ``GenerateAnimatedCubes`` (2280-2301): 512-instance pool with randomized
    orbit parameters;
  * sun animation (2017-2027): sinusoidal azimuth/elevation drift;
  * emulated camera motion modes (1958-2007): periodic pan / orbit for
    hands-free temporal testing;
  * "nine brothers" (2031-2080): a camera-attached 3x3 grid of instances.

All drivers are pure functions of time -> transforms, so a whole animated
frame (animate -> transform_scene -> refit_context -> render) jits as one
program and is differentiable w.r.t. time/params.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OrbitPool:
    """Randomized orbit parameters for a pool of animated instances
    (GenerateAnimatedCubes parity: random center, radii, period, phase, spin)."""

    center: jnp.ndarray      # (N, 3)
    radius: jnp.ndarray      # (N, 2) ellipse radii
    period: jnp.ndarray      # (N,) seconds per revolution
    phase: jnp.ndarray       # (N,)
    axis: jnp.ndarray        # (N, 3) orbit plane normal (unit)
    spin_rate: jnp.ndarray   # (N,) local rotation rad/s
    scale: jnp.ndarray       # (N,)


def generate_orbit_pool(n: int, extent=10.0, seed: int = 0) -> OrbitPool:
    rs = np.random.RandomState(seed)
    axis = rs.randn(n, 3).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    return OrbitPool(
        center=jnp.asarray(((rs.rand(n, 3) - 0.5) * 2 * extent).astype(np.float32)),
        radius=jnp.asarray((0.5 + rs.rand(n, 2) * 2.0).astype(np.float32)),
        period=jnp.asarray((4.0 + rs.rand(n) * 12.0).astype(np.float32)),
        phase=jnp.asarray((rs.rand(n) * 2 * np.pi).astype(np.float32)),
        axis=jnp.asarray(axis),
        spin_rate=jnp.asarray((rs.randn(n) * 1.5).astype(np.float32)),
        scale=jnp.asarray((0.3 + rs.rand(n) * 0.7).astype(np.float32)),
    )


def _axis_angle_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis (unit), (...,) angle -> (..., 3, 3) Rodrigues rotation."""
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    ax = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(ax[0])
    k = jnp.stack([
        jnp.stack([zero, -ax[2], ax[1]], axis=-1),
        jnp.stack([ax[2], zero, -ax[0]], axis=-1),
        jnp.stack([-ax[1], ax[0], zero], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), k.shape)
    return eye + s * k + (1.0 - c) * (k @ k)


def orbit_transforms(pool: OrbitPool, t) -> jnp.ndarray:
    """(N, 3, 4) rigid transforms at time t (AnimatedInstance::Animate)."""
    t = jnp.asarray(t, jnp.float32)
    angle = 2.0 * jnp.pi * t / pool.period + pool.phase

    # orthonormal basis of each orbit plane
    a = pool.axis
    helper = jnp.where(
        (jnp.abs(a[..., 2:3]) < 0.9), jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([1.0, 0.0, 0.0])
    )
    u = jnp.cross(a, jnp.broadcast_to(helper, a.shape))
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-9)
    v = jnp.cross(a, u)

    pos = (
        pool.center
        + u * (pool.radius[..., 0:1] * jnp.cos(angle)[..., None])
        + v * (pool.radius[..., 1:2] * jnp.sin(angle)[..., None])
    )
    rot = _axis_angle_matrix(a, pool.spin_rate * t) * pool.scale[..., None, None]
    return jnp.concatenate([rot, pos[..., :, None]], axis=-1)


def animate_sun(base_azimuth, base_elevation, t, swing_deg=10.0, period_s=30.0):
    """Sinusoidal sun drift (NRDSample.cpp:2017-2027 ``animateSun``)."""
    t = jnp.asarray(t, jnp.float32)
    w = 2.0 * jnp.pi / period_s
    return (
        base_azimuth + swing_deg * jnp.sin(w * t),
        base_elevation + 0.3 * swing_deg * jnp.sin(2.0 * w * t),
    )


def emulate_camera_motion(base_eye: jnp.ndarray, t, mode: int = 1,
                          amplitude=0.5, period_s=4.0) -> jnp.ndarray:
    """Periodic camera displacement (NRDSample.cpp:1958-2007 motion modes):
    mode 1 = horizontal strafe, 2 = vertical bob, 3 = circular."""
    t = jnp.asarray(t, jnp.float32)
    w = 2.0 * jnp.pi / period_s
    dx = amplitude * jnp.sin(w * t)
    dz = amplitude * jnp.cos(w * t)
    if mode == 1:
        off = jnp.stack([dx, jnp.zeros_like(dx), jnp.zeros_like(dx)])
    elif mode == 2:
        off = jnp.stack([jnp.zeros_like(dx), jnp.zeros_like(dx), dx])
    else:
        off = jnp.stack([dx, jnp.zeros_like(dx), dz])
    return base_eye + off


def nine_brothers_transforms(cam_pos: jnp.ndarray, forward: jnp.ndarray,
                             right: jnp.ndarray, up: jnp.ndarray,
                             distance=3.0, spacing=1.2) -> jnp.ndarray:
    """(9, 3, 4): a camera-attached 3x3 grid ahead of the camera
    (NRDSample.cpp:2031-2080)."""
    ii, jj = jnp.meshgrid(jnp.arange(3) - 1, jnp.arange(3) - 1, indexing="ij")
    offs = (
        ii.reshape(-1, 1) * spacing * right
        + jj.reshape(-1, 1) * spacing * up
    )
    pos = cam_pos + forward * distance + offs
    rot = jnp.broadcast_to(jnp.eye(3, dtype=pos.dtype), (9, 3, 3))
    return jnp.concatenate([rot, pos[..., :, None]], axis=-1)
