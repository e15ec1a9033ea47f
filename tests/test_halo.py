"""Explicit halo exchange under shard_map (SURVEY.md §2.4(d)): a row-sharded
stencil with exchange_rows must equal the unsharded stencil EXACTLY, including
at shard boundaries."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nrdsample_tpu.parallel import halo


def _blur3(x):
    """3-row vertical box blur with clamped edges (radius 1)."""
    up = jnp.concatenate([x[:1], x[:-1]], axis=0)
    dn = jnp.concatenate([x[1:], x[-1:]], axis=0)
    return (up + x + dn) / 3.0


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("rows",))


def test_exchange_rows_matches_unsharded(mesh):
    h, w = 64, 16
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(h, w).astype(np.float32))

    expect = _blur3(img)

    def local(x):
        xp = halo.exchange_rows(x, 1, "rows")
        # interior blur on the padded block (no clamping needed inside)
        yp = (xp[:-2] + xp[1:-1] + xp[2:]) / 3.0
        return yp

    fn = shard_map(
        local, mesh=mesh, in_specs=P("rows"), out_specs=P("rows")
    )
    got = jax.jit(fn)(img)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-6)


def test_stencil_with_halo_wrapper(mesh):
    h, w = 32, 8
    img = jnp.asarray(np.arange(h * w, dtype=np.float32).reshape(h, w))

    def stencil(x):
        return _blur3(_blur3(x))  # radius-2 compound stencil

    wrapped = halo.stencil_with_halo(stencil, 2, "rows")
    fn = shard_map(wrapped, mesh=mesh, in_specs=P("rows"), out_specs=P("rows"))
    got = np.asarray(jax.jit(fn)(img))
    # NOTE: the clamped-edge semantics differ between "clamp at shard edge of
    # the padded block" and "clamp at the true image edge" for compound
    # stencils; interior rows must match exactly
    expect = np.asarray(stencil(img))
    np.testing.assert_allclose(got[4:-4], expect[4:-4], atol=1e-5)


def test_exchange_rows_channels(mesh):
    """Works on (H, W, C) arrays too."""
    h, w = 16, 4
    img = jnp.asarray(np.random.RandomState(1).rand(h, w, 3).astype(np.float32))

    def local(x):
        xp = halo.exchange_rows(x, 1, "rows")
        assert xp.shape[0] == x.shape[0] + 2
        return halo.crop_rows(xp, 1)

    fn = shard_map(local, mesh=mesh, in_specs=P("rows"), out_specs=P("rows"))
    got = np.asarray(jax.jit(fn)(img))
    np.testing.assert_allclose(got, np.asarray(img), atol=1e-7)
