"""Adaptive accumulation + history-reset policy (NRDSample.cpp:2139-2189).

Host-side, once per frame, OUTSIDE jit: the accumulation-frame cap is derived
from the measured (smoothed) frame time so history length tracks wall-clock
time (ACCUMULATION_TIME seconds) rather than a fixed frame count, and abrupt
emission-intensity changes soft-reset the history FPS-independently.

The result lands in `Settings.max_accumulated_frame_num`, which the jitted
frame reads via `pipeline.frame._max_acc` — so the jit program is unchanged
frame to frame (the cap is a traced scalar, not a static).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from nrdsample_tpu.config import Settings

# NRDSample.cpp:27 — target history length in seconds
ACCUMULATION_TIME = 0.5
# NRDSample.cpp:38 — min(60, REBLUR/RELAX max history)
MAX_HISTORY_FRAME_NUM = 60
# NRDSample.cpp:2164 — fps used for the cap is clamped (no unbounded history
# growth on very fast frames)
_MAX_FPS = 121.0


@dataclasses.dataclass
class FrameTimer:
    """Exponentially smoothed frame time (Timer.GetVerySmoothedFrameTime
    analogue; the reference smooths over ~32 frames)."""

    smoothed_ms: float = 16.7
    alpha: float = 0.03

    def update(self, frame_ms: float) -> float:
        self.smoothed_ms += (frame_ms - self.smoothed_ms) * self.alpha
        return self.smoothed_ms


def max_accumulated_frames(smoothed_frame_ms: float,
                           boost_with_sharc: bool = False) -> int:
    """frames = ACCUMULATION_TIME * fps, fps capped (NRDSample.cpp:2161-2169).
    boost_with_sharc shortens the window to 2/3 (the SHARC 'boost' coupling,
    :2166)."""
    fps = min(1000.0 / max(smoothed_frame_ms, 1e-3), _MAX_FPS)
    acc_time = ACCUMULATION_TIME * (0.667 if boost_with_sharc else 1.0)
    frames = max(int(round(acc_time * fps)), 1)
    return min(frames, MAX_HISTORY_FRAME_NUM)


def emission_reset_factor(emission_now: float, emission_prev: float,
                          smoothed_frame_ms: float) -> float:
    """Soft history-reset factor in (0, 1] from emission-intensity change
    (NRDSample.cpp:2150-2158): log-space delta, FPS-normalized so the decay
    rate is wall-clock invariant."""
    a = math.log2(1.0 + emission_now)
    b = math.log2(1.0 + emission_prev)
    d = abs(a - b) * 1000.0 / max(smoothed_frame_ms, 1e-3)
    return 1.0 / (1.0 + 0.2 * d)


def update(settings: Settings, settings_prev: Settings | None,
           smoothed_frame_ms: float, boost_with_sharc: bool = False) -> Settings:
    """One PrepareFrame adaptive-accumulation step: returns settings with
    max_accumulated_frame_num = adaptive cap x emission soft-reset factor
    (NRDSample.cpp:2139-2189). Call each frame with the smoothed frame time;
    hard resets (denoiser change, frame 0) stay the caller's job via the
    frame function's reset_history flag."""
    cap = max_accumulated_frames(smoothed_frame_ms, boost_with_sharc)
    factor = 1.0
    if settings_prev is not None:
        factor = emission_reset_factor(
            float(settings.emission_intensity),
            float(settings_prev.emission_intensity),
            smoothed_frame_ms,
        )
    frames = max(int(cap * factor + 0.5), 1)
    return dataclasses.replace(
        settings, max_accumulated_frame_num=jnp.int32(frames)
    )
