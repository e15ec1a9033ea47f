"""REFERENCE denoiser: plain temporal accumulation — the converged-image oracle.

Reference: NRD's REFERENCE denoiser (NRDSample.cpp:920-921, 4213-4227), which
accumulates up to REFERENCE_MAX_HISTORY_FRAME_NUM frames with equal weight while
the camera is still, and is used as ground truth behind the split-screen
separator (SURVEY.md §4.7).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

REFERENCE_MAX_HISTORY = 1024


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ReferenceHistory:
    accum: jnp.ndarray        # (N, 3) running mean
    frames: jnp.ndarray       # () int32 frames accumulated

    @staticmethod
    def create(n_pixels: int, dtype=jnp.float32) -> "ReferenceHistory":
        return ReferenceHistory(
            accum=jnp.zeros((n_pixels, 3), dtype), frames=jnp.int32(0)
        )


def accumulate(history: ReferenceHistory, radiance: jnp.ndarray,
               reset: jnp.ndarray | bool = False,
               max_frames: int = REFERENCE_MAX_HISTORY):
    """One accumulation step: running mean with history clamp.

    `reset` implements AccumulationMode::CLEAR_AND_RESTART (history reset on
    camera/settings change, NRDSample.cpp:3864, 2139-2147).
    """
    frames = jnp.where(reset, 0, history.frames)
    accum = jnp.where(reset, jnp.zeros_like(history.accum), history.accum)
    n = jnp.minimum(frames + 1, max_frames).astype(radiance.dtype)
    new_accum = accum + (radiance - accum) / n
    out = ReferenceHistory(accum=new_accum, frames=frames + 1)
    return new_accum, out
