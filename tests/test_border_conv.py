"""Border-correction conv lowering == halo-exchange conv, bit-for-bit state.

The BORDER_CONV path (ops/layers.py:_border_conv) replaces the padded-block
materialization with strip-conv corrections added to the output borders; it
must reproduce the exchange path's outputs (up to fp32 summation-order
rounding) and leave the identical strip-canvas state, across strides,
dilations, grouped convs, dtypes, and multi-frame temporal reuse (skipped
blocks reading stale neighbor strips).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blockcopy_tpu.ops.layers as L
from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import ExecCtx, split_dense


def run_convs(border, frames, grids, w, bias, stride, dilation, groups,
              n=1, gh=3, gw=4):
    old = L.BORDER_CONV
    L.BORDER_CONV = border
    try:
        outs = []
        canvases = {}
        building = True
        for frame, grid in zip(frames, grids):
            idx = gridlib.exec_indices(grid, int(grid.sum()))
            ctx = ExecCtx.blocked(idx, n, gh, gw, canvases,
                                  building=building)
            building = False
            pack = split_dense(frame, idx, n, gh, gw)
            out = L.conv2d(ctx, "c", pack, w, bias, stride=stride,
                           dilation=dilation, groups=groups)
            outs.append(np.asarray(out.data, np.float32))
            canvases = ctx.canvases
        return outs, jax.tree_util.tree_map(np.asarray, canvases)
    finally:
        L.BORDER_CONV = old


@pytest.mark.parametrize(
    "stride,dilation,groups,dtype",
    [
        (1, 1, 1, np.float32),
        (1, 1, 1, jnp.bfloat16),
        (2, 1, 1, np.float32),
        (1, 2, 1, np.float32),   # CSP dilated-stage shape (p=2)
        (1, 1, 4, np.float32),   # ResNeXt grouped conv
    ],
)
def test_border_conv_matches_exchange(stride, dilation, groups, dtype):
    n, gh, gw, bs, c, co = 1, 3, 4, 8, 16, 24
    rs = np.random.RandomState(0)
    frames = [jnp.asarray(rs.randn(n, gh * bs, gw * bs, c).astype(dtype))
              for _ in range(4)]
    grids = [
        jnp.ones((n, gh, gw), bool),  # frame 0: all-exec fills every strip
        jnp.zeros((n, gh, gw), bool).at[0, ::2, 1::2].set(True),
        jnp.zeros((n, gh, gw), bool).at[0, 1, :].set(True),
        jnp.zeros((n, gh, gw), bool).at[0, :, 2].set(True),
    ]
    w = jnp.asarray(rs.randn(3, 3, c // groups, co).astype(np.float32))
    bias = jnp.asarray(rs.randn(co).astype(np.float32))

    ref, ref_canvas = run_convs(False, frames, grids, w, bias, stride,
                                dilation, groups)
    got, got_canvas = run_convs(True, frames, grids, w, bias, stride,
                                dilation, groups)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    for t, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol,
                                   err_msg=f"frame {t}")
    # Canvas (temporal) state must be IDENTICAL — the lowering only changes
    # how the conv reads strips, not what is stored.
    jax.tree_util.tree_map(np.testing.assert_array_equal, ref_canvas,
                           got_canvas)


def test_border_conv_vs_dense_all_exec():
    """With every block executed, the blocked border conv must equal the
    dense conv on the assembled image (zero padding at true borders)."""
    n, gh, gw, bs, c, co = 1, 3, 4, 8, 16, 8
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.randn(n, gh * bs, gw * bs, c).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, c, co).astype(np.float32))

    dense_ctx = ExecCtx.dense()
    dense = np.asarray(L.conv2d(dense_ctx, "c", img, w, None))

    old = L.BORDER_CONV
    L.BORDER_CONV = True
    try:
        idx = gridlib.exec_indices(jnp.ones((n, gh, gw), bool), gh * gw)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(img, idx, n, gh, gw)
        out = L.conv2d(ctx, "c", pack, w, None)
    finally:
        L.BORDER_CONV = old
    from blockcopy_tpu.core.blocked import block_layout_to_dense
    got = np.asarray(block_layout_to_dense(out.data, n, gh, gw))
    np.testing.assert_allclose(dense, got, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_border_max_pool_matches_exchange(stride, dtype):
    n, gh, gw, bs, c = 1, 3, 4, 8, 16
    rs = np.random.RandomState(3)
    frames = [jnp.asarray(rs.randn(n, gh * bs, gw * bs, c).astype(dtype))
              for _ in range(3)]
    grids = [
        jnp.ones((n, gh, gw), bool),
        jnp.zeros((n, gh, gw), bool).at[0, 1:, ::2].set(True),
        jnp.zeros((n, gh, gw), bool).at[0, 0, :].set(True),
    ]

    def run(border):
        old = L.BORDER_CONV
        L.BORDER_CONV = border
        try:
            outs = []
            canvases = {}
            building = True
            for frame, grid in zip(frames, grids):
                idx = gridlib.exec_indices(grid, int(grid.sum()))
                ctx = ExecCtx.blocked(idx, n, gh, gw, canvases,
                                      building=building)
                building = False
                pack = split_dense(frame, idx, n, gh, gw)
                out = L.max_pool2d(ctx, "mp", pack, 3, stride, 1)
                outs.append(np.asarray(out.data, np.float32))
                canvases = ctx.canvases
            return outs, jax.tree_util.tree_map(np.asarray, canvases)
        finally:
            L.BORDER_CONV = old

    ref, ref_canvas = run(False)
    got, got_canvas = run(True)
    for t, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {t}")
    jax.tree_util.tree_map(np.testing.assert_array_equal, ref_canvas,
                           got_canvas)


def test_border_conv_fallback_shapes_use_exchange():
    """Unsupported shapes (k=7) must silently take the exchange path."""
    n, gh, gw, bs, c, co = 1, 2, 2, 8, 4, 4
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.randn(n, gh * bs, gw * bs, c).astype(np.float32))
    w = jnp.asarray(rs.randn(7, 7, c, co).astype(np.float32))
    old = L.BORDER_CONV
    L.BORDER_CONV = True
    try:
        idx = gridlib.exec_indices(jnp.ones((n, gh, gw), bool), gh * gw)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(img, idx, n, gh, gw)
        out = L.conv2d(ctx, "c", pack, w, None, stride=2, padding=3)
    finally:
        L.BORDER_CONV = old
    assert out.data.shape == (gh * gw, bs // 2, bs // 2, co)
