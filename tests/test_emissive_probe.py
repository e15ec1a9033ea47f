"""Pallas emissive light-probe == the dense XLA probe (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nrdsample_tpu.ops import emissive_probe
from nrdsample_tpu.render import emissive_is
from nrdsample_tpu.scene import procedural


def _em_and_rays(scene_fn, n=5000, seed=0, spread=2.0):
    scene = scene_fn()
    em = emissive_is.build_emissive_set(scene)
    rs = np.random.RandomState(seed)
    o = jnp.asarray(rs.uniform(-spread, spread, (n, 3)).astype(np.float32))
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return em, o, jnp.asarray(d)


@pytest.mark.parametrize("scene_fn", [procedural.cornell_box,
                                      procedural.kitchen,
                                      procedural.interior_night])
def test_probe_matches_dense(scene_fn):
    em, o, d = _em_and_rays(scene_fn)
    assert emissive_probe.usable(em)
    ref = np.asarray(emissive_is.light_probe(em, o, d))
    got = np.asarray(emissive_probe.light_probe_pallas(em, o, d,
                                                       interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    assert (ref > 0).any()  # some rays see a light


def test_probe_unpadded_tail():
    """N not a multiple of the block: the pad rays are zeros (degenerate
    direction -> det 0 -> miss) and the tail slices back exactly."""
    em, o, d = _em_and_rays(procedural.cornell_box, n=333)
    ref = np.asarray(emissive_is.light_probe(em, o, d))
    got = np.asarray(emissive_probe.light_probe_pallas(em, o, d,
                                                       interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
