"""PNG writing + tonemapped output — the swapchain/Final.cs.hlsl stand-in for a
headless harness (AOV dump-to-PNG per SURVEY.md §5.5)."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png(path: str, img: np.ndarray) -> None:
    """Write an (H, W, 3) float [0,1] or uint8 array as PNG (no deps)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    h, w = img.shape[:2]
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", header)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def tonemap_for_display(hdr: np.ndarray, exposure: float = 1.0) -> np.ndarray:
    """Uncharted tonemap + sRGB for PNG output (ApplyTonemap + Final sRGB)."""
    import jax.numpy as jnp

    from nrdsample_tpu.mathlib import color

    x = jnp.asarray(hdr) * exposure
    ldr = color.tonemap_uncharted(x)
    return np.asarray(color.linear_to_srgb(jnp.clip(ldr, 0.0, 1.0)))
