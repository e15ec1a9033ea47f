"""Denoiser behavioral tests (SURVEY.md §7.3.3: validate temporal convergence +
disocclusion response, not bit-exactness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nrdsample_tpu.denoise import common, reblur, relax, sigma, taa
from nrdsample_tpu.mathlib import rng

H = W = 48


def _noisy_signal(seed, mean=1.0):
    n = rng.uniform1(jnp.arange(H * W), seed, 0).reshape(H, W)
    return (mean + (n - 0.5))[..., None].repeat(3, -1)


def _static_geom():
    view_z = jnp.full((H, W), 5.0)
    normal = jnp.zeros((H, W, 3)).at[..., 2].set(1.0)
    mv = jnp.zeros((H, W, 3))
    return view_z, normal, mv


class TestRelax:
    def test_flat_region_smoothed(self):
        view_z, normal, mv = _static_geom()
        hist = relax.RelaxHistory.create(H, W)
        out = None
        for f in range(6):
            out, hist = relax.denoise(hist, _noisy_signal(f), view_z, normal, mv)
        res = np.asarray(out)
        assert abs(res.mean() - 1.0) < 0.05         # unbiased
        assert res.std() < 0.05                     # variance crushed (input std ~0.29)

    def test_edge_preserved(self):
        view_z, normal, mv = _static_geom()
        # depth edge at the middle: two flat planes with different signal levels
        view_z = view_z.at[:, W // 2 :].set(10.0)
        signal = jnp.where(
            (jnp.arange(W) >= W // 2)[None, :, None], 2.0, 0.5
        ) * jnp.ones((H, W, 3))
        hist = relax.RelaxHistory.create(H, W)
        out, _ = relax.denoise(hist, signal, view_z, normal, mv)
        res = np.asarray(out)
        left = res[:, : W // 2 - 2].mean()
        right = res[:, W // 2 + 2 :].mean()
        assert abs(left - 0.5) < 0.1
        assert abs(right - 2.0) < 0.1

    def test_disocclusion_resets_history(self):
        view_z, normal, mv = _static_geom()
        hist = relax.RelaxHistory.create(H, W)
        for f in range(4):
            _, hist = relax.denoise(hist, jnp.ones((H, W, 3)) * 5.0, view_z, normal, mv)
        # now depth changes drastically -> history must be rejected
        out, _ = relax.denoise(hist, jnp.ones((H, W, 3)) * 1.0, view_z * 3.0, normal, mv)
        assert abs(float(np.asarray(out).mean()) - 1.0) < 0.15


class TestReblur:
    def test_convergence_and_smoothing(self):
        view_z, normal, mv = _static_geom()
        rough = jnp.full((H, W), 1.0)
        hitdist = jnp.full((H, W), 1.0)
        hist = reblur.ReblurHistory.create(H, W)
        out = None
        for f in range(8):
            out, hist = reblur.denoise(
                hist, _noisy_signal(f), hitdist, view_z, normal, rough, mv, f, 0.01
            )
        res = np.asarray(out)
        assert abs(res.mean() - 1.0) < 0.06
        assert res.std() < 0.06

    def test_history_fix_reconstructs_disocclusion(self):
        """Fresh history (frames ~ 1) gets spatially reconstructed: the wide
        bilateral must crush single-pixel noise far below what the fix-free
        path leaves; converged history (frames >> fixNum) is untouched."""
        view_z, normal, _ = _static_geom()
        noisy = _noisy_signal(11)
        s = reblur.ReblurSettings()
        fresh = jnp.ones((H, W))
        fixed, _ = reblur.history_fix(noisy, noisy, view_z, normal, fresh, s)
        # frames=1 -> fix weight 2/3: expect ~2.5x std reduction (the residual
        # 1/3 of raw noise dominates; pure blur would be ~5x)
        assert float(np.asarray(fixed).std()) < 0.45 * float(np.asarray(noisy).std())
        conv = jnp.full((H, W), 30.0)
        same, _ = reblur.history_fix(noisy, noisy, view_z, normal, conv, s)
        np.testing.assert_allclose(np.asarray(same), np.asarray(noisy), atol=1e-6)

    def test_history_fix_respects_depth_edges(self):
        view_z, normal, _ = _static_geom()
        view_z = view_z.at[:, W // 2:].set(50.0)
        signal = jnp.where(
            (jnp.arange(W) >= W // 2)[None, :, None], 3.0, 0.5
        ) * jnp.ones((H, W, 3))
        s = reblur.ReblurSettings()
        fresh = jnp.ones((H, W))
        fixed, _ = reblur.history_fix(signal, signal, view_z, normal, fresh, s)
        res = np.asarray(fixed)
        assert abs(res[:, : W // 2 - 5].mean() - 0.5) < 0.05
        assert abs(res[:, W // 2 + 5:].mean() - 3.0) < 0.05

    def test_contact_region_blur_smaller(self):
        # hit distance ~0 (contact) must blur less than far hit distance
        view_z, normal, mv = _static_geom()
        rough = jnp.full((H, W), 1.0)
        sig = _noisy_signal(3)
        hist = reblur.ReblurHistory.create(H, W)
        out_far, _ = reblur.denoise(
            hist, sig, jnp.full((H, W), 10.0), view_z, normal, rough, mv, 0, 0.01
        )
        hist2 = reblur.ReblurHistory.create(H, W)
        out_near, _ = reblur.denoise(
            hist2, sig, jnp.full((H, W), 0.001), view_z, normal, rough, mv, 0, 0.01
        )
        assert float(np.asarray(out_far).std()) < float(np.asarray(out_near).std())


class TestSigma:
    def test_penumbra_soften(self):
        view_z, normal, mv = _static_geom()
        # hard shadow edge down the middle with a reported occluder distance
        shadow = jnp.where((jnp.arange(W) >= W // 2)[None, :], 1.0, 0.0) * jnp.ones((H, W))
        hit_dist = jnp.where(shadow < 0.5, 2.0, 0.0)
        hist = sigma.SigmaHistory.create(H, W)
        out, _ = sigma.denoise(hist, shadow, hit_dist, view_z, mv, 0.2, 0.01, 0)
        res = np.asarray(out)
        # edge must be softened: intermediate values appear near the boundary
        edge = res[:, W // 2 - 4 : W // 2 + 4]
        assert ((edge > 0.1) & (edge < 0.9)).any()
        # far field keeps its value
        assert res[:, :8].mean() < 0.3
        assert res[:, -8:].mean() > 0.7

    def test_contact_umbra_survives_wide_penumbra(self):
        """Round-4 regression: the dilated blur chain must keep an umbra when
        the reported penumbra radius is wide. A 20px-wide dark band with an
        8px penumbra radius still has pixels < 0.1 after denoising."""
        view_z, normal, mv = _static_geom()
        band = (jnp.abs(jnp.arange(W) - W // 2) < 10)[None, :] * jnp.ones((H, W))
        shadow = 1.0 - band
        hit_dist = band * 8.0    # penumbra radius 8px vs 10px umbra half-width
        hist = sigma.SigmaHistory.create(H, W)
        out = None
        for f in range(3):
            out, hist = sigma.denoise(hist, shadow, hit_dist, view_z, mv, 0.05, 0.01, f)
        res = np.asarray(out)
        assert (res < 0.1).any(), f"umbra erased: min={res.min():.3f}"
        soft = ((res > 0.12) & (res < 0.88)).mean()
        assert soft > 0.05

    def test_disocclusion_rejects_stale_history(self):
        """SIGMA temporal must reject history across a depth discontinuity
        (camera-motion ghosting guard): a fully-dark accumulated history on
        near geometry must not bleed into a newly-revealed far surface."""
        view_z, normal, mv = _static_geom()
        dark = jnp.zeros((H, W))
        lit = jnp.ones((H, W))
        no_hit = jnp.zeros((H, W))
        hist = sigma.SigmaHistory.create(H, W)
        for f in range(4):  # accumulate dark shadow on z=5 geometry
            _, hist = sigma.denoise(hist, dark, no_hit, view_z, mv, 0.05, 0.01, f)
        # disocclusion: same pixels now see z=9 geometry, fully lit
        far_z = jnp.full((H, W), 9.0)
        out, _ = sigma.denoise(hist, lit, no_hit, far_z, mv, 0.05, 0.01, 4)
        assert float(np.asarray(out).min()) > 0.95, "shadow ghosted across depth edge"
        # control: unchanged depth keeps accumulating (history still used)
        out2, _ = sigma.denoise(hist, lit, no_hit, view_z, mv, 0.05, 0.01, 4)
        assert float(np.asarray(out2).mean()) < 0.5


class TestTaa:
    def test_jitter_noise_suppressed(self):
        view_z, normal, mv = _static_geom()
        hist = taa.TaaHistory.create(H, W)
        out = None
        for f in range(8):
            frame_c = 0.5 + 0.2 * (rng.uniform1(jnp.arange(H * W), f, 1).reshape(H, W) - 0.5)
            cur = frame_c[..., None].repeat(3, -1)
            out, hist = taa.apply(hist, cur, mv, view_z)
        assert float(np.asarray(out).std()) < 0.03

    def test_first_frame_passthrough(self):
        view_z, normal, mv = _static_geom()
        hist = taa.TaaHistory.create(H, W)
        cur = jnp.full((H, W, 3), 0.7)
        out, hist2 = taa.apply(hist, cur, mv, view_z)
        np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)
        assert int(hist2.valid) == 1


class TestCommon:
    def test_reproject_identity(self):
        img = rng.uniform1(jnp.arange(H * W), 0, 2).reshape(H, W)[..., None]
        out = common.reproject(img, jnp.zeros((H, W, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_reproject_shift(self):
        img = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)[..., None]
        mv = jnp.zeros((H, W, 2)).at[..., 0].set(1.0)  # prev is 1px to the right
        out = common.reproject(img, mv)
        np.testing.assert_allclose(
            np.asarray(out[5, 10, 0]), np.asarray(img[5, 11, 0]), atol=1e-4
        )


def test_anti_firefly_clamps_outlier():
    """NRD enableAntiFirefly parity: a 1e4x spike is pulled to the
    neighborhood ceiling; smooth regions pass through unchanged."""
    from nrdsample_tpu.denoise import common as dn_common

    img = np.full((16, 16, 3), 0.2, np.float32)
    img[8, 8] = 2000.0
    out = np.asarray(dn_common.anti_firefly(jnp.asarray(img)))
    assert out[8, 8, 0] <= 0.2 + 1e-5          # clamped to neighbors
    np.testing.assert_allclose(out[2:6, 2:6], 0.2, atol=1e-6)  # flat preserved
    # an actual edge (legitimate contrast) survives within neighbor range
    img2 = np.full((8, 8, 3), 0.1, np.float32)
    img2[:, 4:] = 1.0
    out2 = np.asarray(dn_common.anti_firefly(jnp.asarray(img2)))
    assert out2[4, 6, 0] == pytest.approx(1.0, abs=1e-5)
