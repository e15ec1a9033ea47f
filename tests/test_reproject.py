"""ops/reproject.py — the Pallas bounded-displacement stencil must equal
clamp-to-edge bilinear exactly for |disp| < d (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nrdsample_tpu.denoise import common
from nrdsample_tpu.mathlib import filtering
from nrdsample_tpu.ops import reproject


@pytest.mark.parametrize("d", [4, 8, 16])
@pytest.mark.parametrize("c", [1, 3])
def test_bounded_matches_bilinear(d, c):
    h = w = 64
    key = jax.random.PRNGKey(d * 10 + c)
    k1, k2 = jax.random.split(key)
    img = jax.random.uniform(k1, (h, w, c), jnp.float32)
    # displacements strictly inside the bound, including off-screen clamping
    disp = jax.random.uniform(k2, (h, w, 2), jnp.float32,
                              minval=-(d - 1), maxval=d - 1)
    pos = common.pixel_positions(h, w) + disp
    ref = filtering.sample_bilinear(img, pos)
    out = reproject.reproject_bounded(img, pos, d, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bounded_2d_plane():
    h = w = 32
    img = jax.random.uniform(jax.random.PRNGKey(0), (h, w), jnp.float32)
    pos = common.pixel_positions(h, w) + 0.4
    ref = filtering.sample_bilinear(img, pos)
    out = reproject.reproject_bounded(img, pos, 4, interpret=True)
    assert out.shape == (h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_batched_taps_fall_back_to_taps():
    """SIGMA-style batched tap requests (leading tap axis) must route to the
    robust tap form — this shape crashed the stencil path (r3 ladder run)."""
    h = w = 16
    img = jax.random.uniform(jax.random.PRNGKey(1), (h, w, 2), jnp.float32)
    pos = jnp.broadcast_to(common.pixel_positions(h, w)[None], (8, h, w, 2))
    out = reproject.sample_bilinear_auto(img, pos)
    assert out.shape == (8, h, w, 2)
    ref = filtering.sample_bilinear(img, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
