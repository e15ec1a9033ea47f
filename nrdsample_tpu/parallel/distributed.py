"""Multi-host orchestration over DCN — jax.distributed + mesh construction.

Reference context (SURVEY.md §5.8): the reference has NO distributed backend —
this is the TPU build's replacement for "NCCL/MPI would go here": DCN handles
process bring-up and scene broadcast; ICI collectives (psum/ppermute inside
the sharded frame/train step, parallel/mesh.py + parallel/halo.py) handle the
per-step communication.

Usage on a multi-host slice (one process per host, standard TPU env vars):

    from nrdsample_tpu.parallel import distributed
    distributed.init()                    # no-op on single process
    mesh = distributed.global_mesh()      # (hosts, chips_per_host) Mesh
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-process; returns whether
    distributed mode is active. Single-process (1 host, CI, CPU tests) is a
    no-op — all entry points work unchanged.

    On Cloud TPU the three arguments auto-detect from the metadata/env; they
    are exposed for bring-up on plain multi-node clusters.
    """
    explicit = coordinator_address is not None
    auto = any(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    ) or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    if not (explicit or auto):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(axis_names: tuple = ("host", "chip")) -> Mesh:
    """(n_hosts, chips_per_host) device mesh: pixel/ray sharding rides the
    'chip' axis (ICI); the 'host' axis crosses DCN and should only carry
    all-reduces that are already small (scene-parameter gradients)."""
    devs = np.array(jax.devices())
    n_proc = jax.process_count()
    per = len(devs) // max(n_proc, 1)
    return Mesh(devs.reshape(n_proc, per), axis_names)


def broadcast_scene(scene):
    """Host-0 scene -> every process (the DCN scene-broadcast role of the
    streamer, SURVEY.md §5.8). With jax.distributed active,
    `jax.experimental.multihost_utils.broadcast_one_to_all` ships the pytree;
    single-process returns the scene unchanged."""
    if jax.process_count() <= 1:
        return scene
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(scene)
