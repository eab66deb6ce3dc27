"""Pallas fused halo kernel must match the XLA lowering exactly
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import (
    alloc_canvas,
    halo_gather,
    scatter_pack,
    split_dense,
)
from blockcopy_tpu.ops.pallas.halo import halo_gather_pallas


@pytest.mark.parametrize("pad", [1, 3])
@pytest.mark.parametrize("partial", [False, True])
def test_pallas_matches_xla(pad, partial):
    n, gh, gw, bs, c = 1, 3, 4, 8, 16
    total = n * gh * gw
    rs = np.random.RandomState(0)
    prev = jnp.asarray(rs.randn(n, gh * bs, gw * bs, c).astype(np.float32))
    cur = jnp.asarray(rs.randn(n, gh * bs, gw * bs, c).astype(np.float32))

    canvas = alloc_canvas(n, gh, gw, bs, c, prev.dtype)
    idx_all = gridlib.exec_indices(jnp.ones((n, gh, gw), bool), total)
    canvas = scatter_pack(canvas, split_dense(prev, idx_all, n, gh, gw))

    if partial:
        grid = jnp.zeros((n, gh, gw), bool).at[0, ::2, 1::2].set(True)
        idx = gridlib.exec_indices(grid, 6)  # includes padding slots
    else:
        idx = idx_all
    pack = split_dense(cur, idx, n, gh, gw)
    canvas = scatter_pack(canvas, pack)

    ref = halo_gather(canvas, idx, pad, n, gh, gw, center=pack.data)
    got = halo_gather_pallas(canvas, idx, pad, n, gh, gw, pack.data)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
