"""Fused Pallas bottleneck tail (interpret mode) == XLA bottleneck path,
outputs and temporal strip-canvas state, over multi-frame partial grids."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blockcopy_tpu.models.swiftnet as S
from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import ExecCtx, split_dense


def bottleneck_params(cin, planes, seed=0):
    rs = np.random.RandomState(seed)
    width = planes

    def conv(kh, kw, ci, co):
        return {"w": jnp.asarray(
            rs.randn(kh, kw, ci, co).astype(np.float32) * 0.1)}

    def bn(c):
        return {"scale": jnp.asarray(1.0 + 0.1 * rs.randn(c).astype(np.float32)),
                "bias": jnp.asarray(0.1 * rs.randn(c).astype(np.float32))}

    return {
        "conv1": conv(1, 1, cin, width), "bn1": bn(width),
        "conv2": conv(3, 3, width, width), "bn2": bn(width),
        "conv3": conv(1, 1, width, cin), "bn3": bn(cin),
    }


def run_frames(fused, frames, grids, p, dtype, n=1, gh=2, gw=4):
    old = S.FUSED_BOTTLENECK
    S.FUSED_BOTTLENECK = fused
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
            out = S._bottleneck_block(ctx, "bn", pack, p, stride=1)
            outs.append(np.asarray(out.data, np.float32))
            canvases = ctx.canvases
        return outs, jax.tree_util.tree_map(np.asarray, canvases)
    finally:
        S.FUSED_BOTTLENECK = old


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
@pytest.mark.parametrize("bs", [8, 16])
def test_fused_tail_matches_xla_path(dtype, bs):
    n, gh, gw = 1, 2, 4
    cin, planes = 256, 128  # lane-aligned mid width -> fused-eligible
    rs = np.random.RandomState(0)
    frames = [jnp.asarray(
        rs.randn(n, gh * bs, gw * bs, cin).astype(dtype)) for _ in range(3)]
    grids = [
        jnp.ones((n, gh, gw), bool),
        jnp.zeros((n, gh, gw), bool).at[0, 0, ::2].set(True)
        .at[0, 1, 1].set(True),
        jnp.zeros((n, gh, gw), bool).at[0, 1, :].set(True),
    ]
    p = bottleneck_params(cin, planes)

    ref, ref_canvas = run_frames(False, frames, grids, p, dtype)
    got, got_canvas = run_frames(True, frames, grids, p, dtype)
    tol = 3e-2 if dtype == jnp.bfloat16 else 1e-4
    for t, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol,
                                   err_msg=f"frame {t}")
    jax.tree_util.tree_map(np.testing.assert_array_equal, ref_canvas,
                           got_canvas)


def test_fused_gate_excludes_unaligned_width():
    """planes=64 (layer1) must silently stay on the XLA path."""
    n, gh, gw, bs = 1, 2, 2, 8
    rs = np.random.RandomState(1)
    frame = jnp.asarray(rs.randn(n, gh * bs, gw * bs, 256).astype(np.float32))
    p = bottleneck_params(256, 64)
    old = S.FUSED_BOTTLENECK
    S.FUSED_BOTTLENECK = True
    try:
        idx = gridlib.exec_indices(jnp.ones((n, gh, gw), bool), gh * gw)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(frame, idx, n, gh, gw)
        out = S._bottleneck_block(ctx, "bn", pack, p, stride=1)
    finally:
        S.FUSED_BOTTLENECK = old
    assert out.data.shape == (gh * gw, bs, bs, 256)
