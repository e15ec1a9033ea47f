"""Hair BCSDF + SSS (the RTXCR material-library slot, SURVEY.md §2.3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu import config
from nrdsample_tpu.render import hair_sss


def test_burley_profile_normalizes():
    """Integral of R(r) over the plane (2*pi*r dr) must be ~1."""
    d = jnp.float32(0.3)
    r = jnp.linspace(1e-4, 10.0, 20000)
    dr = float(r[1] - r[0])
    integrand = 2.0 * np.pi * np.asarray(r) * np.asarray(hair_sss.burley_profile(r, d))
    assert integrand.sum() * dr == pytest.approx(1.0, abs=0.02)


def test_sss_wrap_extends_terminator():
    bc = jnp.full((1, 3), 0.6)
    lit = hair_sss.sss_wrap_diffuse(jnp.asarray([0.5]), bc)
    dark_hard = hair_sss.sss_wrap_diffuse(jnp.asarray([-0.05]), bc, 0.0)
    dark_sss = hair_sss.sss_wrap_diffuse(jnp.asarray([-0.05]), bc, 0.5)
    # beyond the terminator: zero without scattering, positive with it
    np.testing.assert_allclose(np.asarray(dark_hard), 0.0, atol=1e-6)
    assert float(dark_sss.max()) > 0.0
    assert float(lit.min()) > 0.0


def test_hair_bcsdf_lobes_finite_and_positive():
    n = 64
    rs = np.random.RandomState(0)
    t = rs.randn(n, 3).astype(np.float32)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    wi = rs.randn(n, 3).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = rs.randn(n, 3).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    bc = jnp.full((n, 3), 0.4)
    rough = jnp.full((n,), 0.3)
    f = np.asarray(hair_sss.hair_bcsdf_eval(
        jnp.asarray(wi), jnp.asarray(wo), jnp.asarray(t), bc, rough
    ))
    assert np.isfinite(f).all()
    assert (f >= 0.0).all()


def test_hair_bcsdf_peaks_near_specular_cone():
    """Reflection lobe peaks when theta_i ~ -theta_o (specular cone)."""
    t = jnp.asarray([[0.0, 0.0, 1.0]])  # fiber along z
    bc = jnp.full((1, 3), 0.5)
    rough = jnp.full((1,), 0.2)

    def eval_at(theta_i, theta_o):
        wi = jnp.asarray([[np.cos(theta_i), 0.0, np.sin(theta_i)]], dtype=jnp.float32)
        wo = jnp.asarray([[np.cos(theta_o), 0.0, np.sin(theta_o)]], dtype=jnp.float32)
        return float(hair_sss.hair_bcsdf_eval(wi, wo, t, bc, rough)[0, 0])

    on_cone = eval_at(-0.3, 0.3)
    off_cone = eval_at(0.8, 0.3)
    assert on_cone > off_cone


def test_hair_sample_unit_and_spread():
    rs = np.random.RandomState(1)
    n = 256
    rnd = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    wo = jnp.broadcast_to(jnp.asarray([0.7, 0.0, 0.714143]), (n, 3))
    t = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    d, w = hair_sss.hair_sample(rnd, wo, t, jnp.full((n,), 0.3))
    d = np.asarray(d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # azimuthal spread around the fiber
    assert d[:, 0].std() > 0.2 and d[:, 1].std() > 0.2


def test_hair_flag_changes_lighting():
    from nrdsample_tpu.render import lighting

    n = jnp.asarray([[0.0, 0.0, 1.0]] * 2)
    v = jnp.asarray([[0.0, -0.7071, 0.7071]] * 2)
    bc = jnp.full((2, 3), 0.5)
    metal = jnp.zeros((2,))
    rough = jnp.full((2,), 0.4)
    sun = jnp.asarray([0.0, 0.0, 1.0])
    flags = jnp.asarray([config.FLAG_NON_TRANSPARENT,
                         config.FLAG_NON_TRANSPARENT | config.FLAG_HAIR], jnp.int32)
    out = np.asarray(lighting.direct_sun_lighting(
        n, v, bc, metal, rough, sun, 0.005, flags=flags
    ))
    base = np.asarray(lighting.direct_sun_lighting(
        n, v, bc, metal, rough, sun, 0.005
    ))
    np.testing.assert_allclose(out[0], base[0], atol=1e-6)  # non-hair unchanged
    assert not np.allclose(out[1], base[1])                 # hair path differs
    assert np.isfinite(out).all()
