"""All halo-exchange implementations must agree bit-for-bit."""

import importlib

import jax.numpy as jnp
import numpy as np
import pytest

import blockcopy_tpu.core.blocked as B
from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import ExecCtx, split_dense


def run_exchange(impl, frames, grids, pad=1):
    old = B.HALO_IMPL
    B.HALO_IMPL = impl
    try:
        n, gh, gw = 1, 3, 4
        outs = []
        canvases = {}
        building = True
        for frame, grid in zip(frames, grids):
            idx = gridlib.exec_indices(grid, int(grid.sum()))
            ctx = ExecCtx.blocked(idx, n, gh, gw, canvases,
                                  building=building)
            building = False
            pack = split_dense(frame, idx, n, gh, gw)
            outs.append(np.asarray(ctx.exchange("c", pack, pad)))
            canvases = ctx.canvases
        return outs
    finally:
        B.HALO_IMPL = old


@pytest.mark.parametrize("pad", [1, 2, 3])
def test_strips_equals_full(pad):
    n, gh, gw, bs, c = 1, 3, 4, 8, 16
    rs = np.random.RandomState(0)
    frames = [jnp.asarray(rs.randn(n, gh * bs, gw * bs, c).astype(np.float32))
              for _ in range(3)]
    grids = [
        jnp.ones((n, gh, gw), bool),
        jnp.zeros((n, gh, gw), bool).at[0, ::2, 1::2].set(True),
        jnp.zeros((n, gh, gw), bool).at[0, 1, :].set(True),
    ]
    full = run_exchange("full", frames, grids, pad)
    strips = run_exchange("strips", frames, grids, pad)
    for t, (a, b) in enumerate(zip(full, strips)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {t}")


def test_strip_storage_is_small():
    n, gh, gw, bs, c, p = 1, 2, 2, 32, 64, 1
    s = B.alloc_strip_canvas(n, gh, gw, bs, c, p, jnp.float32)
    full = B.alloc_canvas(n, gh, gw, bs, c, jnp.float32)
    strip_bytes = sum(np.prod(v.shape) for v in s.values())
    assert strip_bytes * 8 <= np.prod(full.shape), (strip_bytes,
                                                    full.shape)
