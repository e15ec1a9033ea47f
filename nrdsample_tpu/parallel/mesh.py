"""Device mesh construction + pixel sharding for the render pipeline.

Design (SURVEY.md §2.4 TPU additions): the image-space analogue of data
parallelism — every per-pixel pass shards its flat pixel dimension over the mesh
axis "px"; the scene is replicated; scene-parameter gradients are `psum`'d over
ICI inside shard_map. Multi-host: the same mesh spans hosts via
jax.distributed.initialize (DCN handles launch/broadcast).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIXEL_AXIS = "px"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (PIXEL_AXIS,))


def pixel_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(PIXEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pixels(mesh: Mesh, n_pixels: int):
    """Flat pixel indices laid out and sharded across the mesh: (N,) int32."""
    idx = jnp.arange(n_pixels, dtype=jnp.int32)
    return jax.device_put(idx, pixel_sharding(mesh))


def pixel_specs_for(tree, n_pixels: int):
    """Per-leaf PartitionSpecs: leaves with a leading pixel dim shard over `px`,
    scalars/others replicate. Used for the History pytree (mixed state)."""
    return jax.tree.map(
        lambda leaf: P(PIXEL_AXIS)
        if (getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == n_pixels)
        else P(),
        tree,
    )


def sharded_render_fn(ctx, cfg, mesh: Mesh):
    """Build a shard_map'd frame function: pixels sharded, scene replicated.

    Returns fn(scene, cam, settings, history, pixel_idx) -> (color, new_history)
    where pixel_idx and history are sharded over `px` and everything else is
    replicated. Inside each shard the computation is the plain single-chip frame
    — XLA ICI collectives only appear where cross-shard data is needed.
    """
    from nrdsample_tpu.pipeline import frame as frame_mod

    def local_frame(scene, cam, settings, history, pixel_idx):
        out, new_h = frame_mod.render_frame(
            ctx, scene, cam, cfg, settings, history, pixel_idx=pixel_idx
        )
        return out["color"], new_h

    hist_spec = pixel_specs_for(frame_mod.History.create(cfg), cfg.n_pixels)
    return jax.shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(P(), P(), P(), hist_spec, P(PIXEL_AXIS)),
        out_specs=(P(PIXEL_AXIS), hist_spec),
        check_vma=False,
    )
