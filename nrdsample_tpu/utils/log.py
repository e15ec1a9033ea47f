"""Structured logging + counters — SURVEY.md §5.5 equivalent of the reference's
stdout stats (ray budget NRDSample.cpp:2111-2119, BVH stats 2848-2863, memory
989/1084) and the ImGui live dashboard, as JSON lines."""

from __future__ import annotations

import json
import sys
import time
from typing import Any


class JsonLogger:
    """One JSON object per line to a stream (stderr by default)."""

    def __init__(self, stream=None, component: str = "nrdsample_tpu"):
        self.stream = stream or sys.stderr
        self.component = component

    def log(self, event: str, **fields: Any) -> None:
        rec = {"ts": time.time(), "component": self.component, "event": event}
        rec.update(fields)
        self.stream.write(json.dumps(rec, default=str) + "\n")
        self.stream.flush()


LOG = JsonLogger()


def log_scene_stats(scene, ctx=None) -> None:
    """BVH/scene build report (NRDSample.cpp:2848-2863 analogue)."""
    import numpy as np

    fields = {
        "tris": int(scene.num_tris),
        "emissive": int(np.asarray(scene.emissive_count)),
        "materials": int(scene.materials.base_color.shape[0]),
    }
    if ctx is not None:
        fields["traversal_mode"] = ctx.mode
        if ctx.clusters is not None:
            fields["clusters"] = int(ctx.clusters.count)
    LOG.log("scene_built", **fields)


def log_frame_stats(frame_idx: int, dt_s: float, cfg, rays_per_pixel: int) -> None:
    """Per-frame perf counters (ray budget + fps; NRDSample ray-budget table)."""
    n = cfg.n_pixels
    LOG.log(
        "frame",
        frame=frame_idx,
        ms=dt_s * 1e3,
        fps=1.0 / max(dt_s, 1e-9),
        mpix_s=n / dt_s / 1e6,
        rays_s=n * rays_per_pixel / dt_s,
        rpp=cfg.rpp,
        bounces=cfg.bounce_num,
    )


def memory_report() -> dict:
    """Device-memory summary (the VRAM report analogue, NRDSample.cpp:1082-1084)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = {}
    LOG.log("memory", devices=out)
    return out
