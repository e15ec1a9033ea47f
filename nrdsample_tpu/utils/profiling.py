"""Profiling + roofline reporting — SURVEY.md §5.1 TPU equivalents of the
reference's per-pass annotations (helper::Annotation) and FPS instrumentation.

Per-pass scoping uses jax.named_scope (visible in XLA/profiler traces);
`trace()` wraps jax.profiler for on-demand TensorBoard traces; `roofline()`
compares measured throughput against HBM/FLOP bounds (the speed-of-light
check BASELINE.md asks for)."""

from __future__ import annotations

import contextlib
import time

import jax

# v5e single-chip peaks (public numbers): 394 TFLOP/s bf16, 197 TFLOP/s-ish f32
# via VPU is much lower; HBM ~819 GB/s. Used for speed-of-light ratios only.
HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v4": 1228.0, "cpu": 50.0}
F32_TFLOPS = {"TPU v5 lite": 4.0, "TPU v4": 4.0, "cpu": 0.1}  # VPU-bound f32


def device_kind() -> str:
    d = jax.devices()[0]
    return getattr(d, "device_kind", "cpu")


named_scope = jax.named_scope


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a profiler trace around a block (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, iters: int = 5, warmup: int = 1):
    """Wall-time a jitted callable with proper blocking."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def roofline(name: str, seconds: float, bytes_moved: float, flops: float) -> dict:
    """Speed-of-light report: fraction of HBM and FLOP bounds achieved."""
    kind = device_kind()
    hbm = next((v for k, v in HBM_GBPS.items() if k in kind), 100.0) * 1e9
    peak = next((v for k, v in F32_TFLOPS.items() if k in kind), 1.0) * 1e12
    t_hbm = bytes_moved / hbm
    t_flop = flops / peak
    bound = "hbm" if t_hbm > t_flop else "flop"
    sol = max(t_hbm, t_flop)
    rec = {
        "kernel": name,
        "ms": seconds * 1e3,
        "sol_ms": sol * 1e3,
        "efficiency": sol / max(seconds, 1e-12),
        "bound": bound,
        "gbps": bytes_moved / seconds / 1e9,
        "gflops": flops / seconds / 1e9,
    }
    from nrdsample_tpu.utils.log import LOG

    LOG.log("roofline", **rec)
    return rec
