"""Blue-noise shadow sampler (USE_BLUE_NOISE_FOR_SHADOWS).

Reference: GetBlueNoise (RaytracingShared.hlsli:699-723) + the Shared.hlsli:25
gate. VERDICT r3 missing #4: the quality claim is that per-frame shadow error
becomes HIGH-frequency — a spatial low-pass (SIGMA's blur / TAA / the eye)
removes it far better than white-noise error of equal variance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.config import Denoiser, RenderConfig
from nrdsample_tpu.mathlib import bluenoise, rng
from nrdsample_tpu.render.trace_opaque import _shadow_rnd


def _spectrum_low_high(field):
    n = field.shape[0]
    f = np.abs(np.fft.fftshift(np.fft.fft2(field - field.mean()))) ** 2
    c = n // 2
    yy, xx = np.mgrid[0:n, 0:n]
    r = np.hypot(yy - c, xx - c)
    low = f[(r > 0) & (r < n / 16)].mean()
    high = f[(r > n * 0.3) & (r < n * 0.45)].mean()
    return low, high


def test_texture_is_blue():
    """The shipped void-and-cluster texture has a strongly high-pass
    spectrum; white noise of the same size does not."""
    tex = np.load(bluenoise._TEXTURE_PATH)
    assert tex.shape == (128, 128) and (0 <= tex).all() and (tex < 1).all()
    # it is a permutation ranking: every value unique
    assert np.unique(tex).size == tex.size
    low, high = _spectrum_low_high(tex)
    assert low < 0.02 * high
    white = np.random.RandomState(0).rand(128, 128).astype(np.float32)
    wlow, whigh = _spectrum_low_high(white)
    assert wlow > 0.3 * whigh


def test_sampled_fields_stay_blue_and_decorrelate():
    """blue2's per-dim fields keep the blue spectrum (rotation/shift preserve
    it) and different frames/dims decorrelate."""
    w = 128
    idx = jnp.arange(w * w, dtype=jnp.int32)
    a = np.asarray(bluenoise.blue2(idx, w, jnp.int32(0), 501)).reshape(w, w, 2)
    c = np.asarray(bluenoise.blue2(idx, w, jnp.int32(0), 10105)).reshape(w, w, 2)
    for ch in range(2):
        low, high = _spectrum_low_high(a[..., ch])
        assert low < 0.05 * high
    # frames are golden-ratio rotations of the same ranking: the value
    # correlation is exactly 1 - 6d(1-d) (d = phi^-1) = -0.417 — what matters
    # temporally is per-pixel STRATIFICATION: over 8 frames every pixel's
    # sequence covers [0,1) with low discrepancy
    seq = np.stack([
        np.asarray(bluenoise.blue2(idx, w, jnp.int32(f), 501))[:256, 0]
        for f in range(8)
    ])  # (8, 256)
    gaps = np.diff(np.sort(seq, axis=0), axis=0).max(axis=0)
    assert gaps.max() < 2.8 / 8  # white noise would exceed this often
    # different dims / channels use shifted textures -> decorrelated
    assert np.abs(np.corrcoef(a[..., 0].ravel(), c[..., 0].ravel())[0, 1]) < 0.2
    assert np.abs(np.corrcoef(a[..., 0].ravel(), a[..., 1].ravel())[0, 1]) < 0.2


@pytest.mark.parametrize("frames", [1, 4])
def test_filtered_shadow_error_beats_white(frames):
    """Monte-Carlo estimate of a soft-shadow visibility integral (a half-disc
    occluder: v(u) = u.x < tau per pixel) at 1 spp/frame: after a small
    spatial low-pass, blue-noise error is well below white-noise error —
    the converged-variance claim of VERDICT r3 #8."""
    w = 128
    idx = jnp.arange(w * w, dtype=jnp.int32)
    rs = np.random.RandomState(3)
    # smoothly varying per-pixel coverage in (0.2, 0.8) — a penumbra ramp
    yy, xx = np.mgrid[0:w, 0:w] / w
    tau = 0.5 + 0.3 * np.sin(2 * np.pi * xx) * np.cos(2 * np.pi * yy)

    def mc(sampler):
        est = np.zeros((w, w))
        for f in range(frames):
            u = np.asarray(sampler(jnp.int32(f)))[:, 0].reshape(w, w)
            est += (u < tau)
        return est / frames

    est_blue = mc(lambda f: bluenoise.blue2(idx, w, f, 501))
    est_white = mc(lambda f: rng.uniform2(idx, f, 501))
    err_b = est_blue - tau
    err_w = est_white - tau
    # raw variance is comparable (same estimator) ...
    assert err_b.std() < err_w.std() * 1.6
    # ... but a 1-pixel-sigma Gaussian low-pass (what SIGMA/TAA/the eye do)
    # kills the blue error and not the white error
    def lp(e):
        k = np.fft.rfft2(e)
        fy = np.fft.fftfreq(w)[:, None]
        fx = np.fft.rfftfreq(w)[None, :]
        g = np.exp(-2 * (np.pi ** 2) * (fy ** 2 + fx ** 2) * (1.5 ** 2) * 4)
        return np.fft.irfft2(k * g, s=(w, w))

    lp_b = lp(err_b).std()
    lp_w = lp(err_w).std()
    assert lp_b < 0.55 * lp_w, (lp_b, lp_w)


def test_shadow_rnd_gate():
    """Blue noise is used for RELAX/REBLUR and off for REFERENCE (the
    Shared.hlsli:25 gate) and off when the config disables it."""
    idx = jnp.arange(16, dtype=jnp.int32)
    cfg_ref = RenderConfig(width=4, height=4, denoiser=Denoiser.REFERENCE)
    assert _shadow_rnd(cfg_ref, idx, jnp.int32(0), 501) is None
    cfg_off = RenderConfig(width=4, height=4, denoiser=Denoiser.RELAX,
                           use_blue_noise=False)
    assert _shadow_rnd(cfg_off, idx, jnp.int32(0), 501) is None
    cfg_on = RenderConfig(width=4, height=4, denoiser=Denoiser.RELAX)
    r = _shadow_rnd(cfg_on, idx, jnp.int32(0), 501)
    assert r is not None and r.shape == (16, 2)
    assert np.isfinite(np.asarray(r)).all()
