"""Unit tests for mathlib vs closed forms (SURVEY.md §4 test-pyramid item (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrdsample_tpu.mathlib import brdf, color, filtering, geometry as geo, packing, rng, sampling


class TestRng:
    def test_uniform_range_and_mean(self):
        u = rng.uniform4(jnp.arange(4096), 7, 3)
        assert u.shape == (4096, 4)
        assert float(u.min()) >= 0.0 and float(u.max()) < 1.0
        assert abs(float(u.mean()) - 0.5) < 0.01

    def test_streams_decorrelated(self):
        a = rng.uniform1(jnp.arange(4096), 0, 0)
        b = rng.uniform1(jnp.arange(4096), 0, 1)
        c = rng.uniform1(jnp.arange(4096), 1, 0)
        assert abs(float(jnp.corrcoef(a, b)[0, 1])) < 0.05
        assert abs(float(jnp.corrcoef(a, c)[0, 1])) < 0.05

    def test_deterministic(self):
        a = rng.uniform4(jnp.arange(64), 5, 2)
        b = rng.uniform4(jnp.arange(64), 5, 2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_halton_low_discrepancy(self):
        h = rng.halton(jnp.arange(1, 257), 2)
        # star discrepancy of first 256 base-2 radical-inverse points is tiny;
        # check mean and that sorted gaps are near-uniform
        assert abs(float(h.mean()) - 0.5) < 0.01
        assert float(h.min()) >= 0.0 and float(h.max()) < 1.0

    def test_bayer_covers_16_values(self):
        px, py = jnp.meshgrid(jnp.arange(4), jnp.arange(4))
        v = rng.bayer4x4(px.ravel(), py.ravel(), 0)
        assert len(np.unique(np.asarray(v).round(4))) == 16


class TestPacking:
    def test_octahedral_roundtrip(self):
        v = sampling.uniform_sphere(rng.uniform2(jnp.arange(2048), 0, 0))
        d = packing.decode_oct(packing.encode_oct(v))
        np.testing.assert_allclose(np.asarray(d), np.asarray(v), atol=1e-6)

    def test_octahedral_poles(self):
        for p in ([0, 0, 1], [0, 0, -1], [1, 0, 0], [0, -1, 0]):
            v = jnp.array([p], jnp.float32)
            d = packing.decode_oct(packing.encode_oct(v))
            np.testing.assert_allclose(np.asarray(d), np.asarray(v), atol=1e-6)


class TestSampling:
    def test_cosine_hemisphere_distribution(self):
        u = rng.uniform2(jnp.arange(1 << 16), 0, 0)
        d = sampling.cosine_ray(u)
        assert float(d[..., 2].min()) >= 0.0
        # E[cos_theta] for cosine-weighted = 2/3
        assert abs(float(d[..., 2].mean()) - 2.0 / 3.0) < 0.01

    def test_cosine_integrates_furnace(self):
        # MC estimate of integral of f*cos/pdf over hemisphere with f = albedo/pi
        # must equal albedo (white furnace, SURVEY.md §4.4).
        albedo = 0.7
        u = rng.uniform2(jnp.arange(1 << 16), 1, 0)
        d = sampling.cosine_ray(u)
        # f*cos/pdf = (albedo/pi)*cos / (cos/pi) = albedo exactly per sample
        est = albedo * jnp.ones_like(d[..., 2])
        assert abs(float(est.mean()) - albedo) < 1e-6

    def test_vndf_halfvec_in_upper_hemisphere(self):
        u = rng.uniform2(jnp.arange(4096), 0, 1)
        v = geo.normalize(jnp.array([[0.5, 0.1, 0.8]], jnp.float32))
        v = jnp.broadcast_to(v, (4096, 3))
        m = sampling.vndf_ggx(u, v, 0.5)
        assert float(m[..., 2].min()) > 0.0
        vm = jnp.sum(v * m, axis=-1)
        assert float(vm.min()) > 0.0  # visible normals face the viewer

    def test_vndf_smooth_limit_is_normal(self):
        u = rng.uniform2(jnp.arange(16), 0, 2)
        v = jnp.broadcast_to(geo.normalize(jnp.array([[0.3, -0.2, 0.9]])), (16, 3))
        m = sampling.vndf_ggx(u, v, 0.0)
        np.testing.assert_allclose(np.asarray(m[..., 2]), 1.0, atol=1e-3)

    def test_ggx_d_normalization(self):
        # integral over hemisphere of D(m) cos = 1
        n = 1 << 17
        u = rng.uniform2(jnp.arange(n), 3, 0)
        # uniform hemisphere sampling: pdf = 1/(2pi)
        d = sampling.uniform_sphere(u)
        d = d.at[..., 2].set(jnp.abs(d[..., 2]))
        alpha = 0.4**2
        integrand = sampling.ggx_d(d[..., 2], alpha) * d[..., 2] * (2 * np.pi)
        assert abs(float(integrand.mean()) - 1.0) < 0.05


class TestBrdf:
    def test_fresnel_limits(self):
        f0 = jnp.array([0.04, 0.04, 0.04])
        np.testing.assert_allclose(
            np.asarray(brdf.fresnel_schlick(f0, jnp.float32(1.0))), 0.04, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(brdf.fresnel_schlick(f0, jnp.float32(0.0))), 1.0, atol=1e-6
        )

    def test_white_furnace_ggx(self):
        # Energy conservation sanity: integral of specular BRDF * cos <= ~1 for f0=1.
        n = jnp.array([0.0, 0.0, 1.0])
        v = geo.normalize(jnp.array([0.0, 0.4, 0.9]))
        k = 1 << 15
        u = rng.uniform2(jnp.arange(k), 0, 0)
        l = sampling.cosine_ray(u)  # pdf = cos/pi
        f0 = jnp.ones((3,))
        nb = jnp.broadcast_to(n, (k, 3))
        vb = jnp.broadcast_to(v, (k, 3))
        fs = brdf.ggx_specular(nb, vb, l, 0.6, f0)
        est = fs * sampling.PI  # / (cos/pi) * cos = f * pi
        e = float(est.mean(axis=0)[0])
        assert 0.3 < e <= 1.15  # single-scatter GGX loses some energy, never gains much

    def test_diffuse_probability_extremes(self):
        p_metal = brdf.estimate_diffuse_probability(
            jnp.zeros((1, 3)), jnp.ones((1, 3)), jnp.float32(0.1), jnp.float32(0.7)
        )
        p_diffuse = brdf.estimate_diffuse_probability(
            jnp.full((1, 3), 0.8), jnp.full((1, 3), 0.04), jnp.float32(1.0), jnp.float32(0.7)
        )
        assert float(p_metal[0]) == 0.0
        assert float(p_diffuse[0]) > 0.7


class TestColor:
    def test_srgb_roundtrip(self):
        c = jnp.linspace(0, 1, 64)
        np.testing.assert_allclose(
            np.asarray(color.srgb_to_linear(color.linear_to_srgb(c))), np.asarray(c), atol=1e-6
        )

    def test_luminance_white(self):
        assert abs(float(color.luminance(jnp.ones(3))) - 1.0) < 1e-5

    def test_tonemap_monotonic(self):
        x = jnp.linspace(0.0, 20.0, 256)[:, None].repeat(3, 1)
        y = color.tonemap_uncharted(x)
        assert np.all(np.diff(np.asarray(y[:, 0])) >= 0)
        assert float(y.max()) <= 1.5


class TestGeometry:
    def test_basis_orthonormal(self):
        n = sampling.uniform_sphere(rng.uniform2(jnp.arange(512), 0, 0))
        t, b = geo.orthonormal_basis(n)
        np.testing.assert_allclose(np.asarray(geo.dot3(t, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(geo.dot3(b, n)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(geo.dot3(t, b)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(geo.length(t)), 1.0, atol=1e-5)

    def test_reflect(self):
        v = jnp.array([1.0, 0.0, -1.0]) / np.sqrt(2)
        n = jnp.array([0.0, 0.0, 1.0])
        r = geo.reflect(v, n)
        np.testing.assert_allclose(np.asarray(r), [1 / np.sqrt(2), 0, 1 / np.sqrt(2)], atol=1e-6)

    def test_refract_tir(self):
        v = geo.normalize(jnp.array([0.99, 0.0, -0.1]))
        n = jnp.array([0.0, 0.0, 1.0])
        r = geo.refract(v, n, 1.5)  # dense->sparse grazing: TIR
        np.testing.assert_allclose(np.asarray(r), 0.0)


class TestFiltering:
    def test_bilinear_exact_at_centers(self):
        img = jnp.arange(12.0).reshape(3, 4, 1)
        pos = jnp.array([[1.5, 0.5], [2.5, 2.5]])  # centers of (1,0) and (2,2)
        out = filtering.sample_bilinear(img, pos)
        np.testing.assert_allclose(np.asarray(out[:, 0]), [1.0, 10.0], atol=1e-6)

    def test_bicubic_reproduces_constant(self):
        img = jnp.full((8, 8, 3), 3.25)
        pos = jnp.array([[4.3, 2.8], [1.1, 6.6]])
        out = filtering.sample_bicubic_no_corners(img, pos)
        np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-5)
