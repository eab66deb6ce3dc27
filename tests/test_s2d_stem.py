"""Space-to-depth stem lowering == halo-exchange 7x7 conv.

The S2D_STEM path (ops/layers.py:_s2d_stem_conv) reshapes few-channel
blocks to s2d-4 cells and runs the 7x7 stride-2 stem as a 3x3 stride-1
conv with zero-weighted extra taps.  It must reproduce the exchange path's
outputs (up to fp32 summation-order rounding) across multi-frame temporal
reuse — skipped blocks' halos come from the s2d strip canvas instead of
raw-pixel strips, carrying the same information.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blockcopy_tpu.ops.layers as L
from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import ExecCtx, block_layout_to_dense, split_dense


def run_stem(s2d, frames, grids, w, bias, n=1, gh=3, gw=4):
    old = L.S2D_STEM
    L.S2D_STEM = s2d
    try:
        outs = []
        canvases = {}
        building = True
        for frame, grid in zip(frames, grids):
            idx = gridlib.exec_indices(grid, int(grid.sum()))
            ctx = ExecCtx.blocked(idx, n, gh, gw, canvases, building=building)
            building = False
            pack = split_dense(frame, idx, n, gh, gw)
            out = L.conv2d(ctx, "stem", pack, w, bias, stride=2, padding=3)
            outs.append(np.asarray(out.data, np.float32))
            canvases = ctx.canvases
        return outs
    finally:
        L.S2D_STEM = old


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_s2d_stem_matches_exchange(dtype):
    n, gh, gw, bs, c, co = 1, 3, 4, 16, 3, 24
    rs = np.random.RandomState(0)
    frames = [jnp.asarray(rs.randn(n, gh * bs, gw * bs, c).astype(dtype))
              for _ in range(4)]
    grids = [
        jnp.ones((n, gh, gw), bool),  # frame 0: all-exec fills every strip
        jnp.zeros((n, gh, gw), bool).at[0, ::2, 1::2].set(True),
        jnp.zeros((n, gh, gw), bool).at[0, 1, :].set(True),
        jnp.zeros((n, gh, gw), bool).at[0, :, 2].set(True),
    ]
    w = jnp.asarray(rs.randn(7, 7, c, co).astype(np.float32))
    bias = jnp.asarray(rs.randn(co).astype(np.float32))

    ref = run_stem(False, frames, grids, w, bias)
    got = run_stem(True, frames, grids, w, bias)
    tol = 3e-2 if dtype == jnp.bfloat16 else 1e-5
    for t, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol,
                                   err_msg=f"frame {t}")


def test_s2d_stem_vs_dense_all_exec():
    """All blocks executed: blocked s2d stem == dense 7x7 s2 p3 conv."""
    n, gh, gw, bs, c, co = 1, 3, 4, 16, 3, 8
    rs = np.random.RandomState(1)
    img = jnp.asarray(rs.randn(n, gh * bs, gw * bs, c).astype(np.float32))
    w = jnp.asarray(rs.randn(7, 7, c, co).astype(np.float32))

    dense = np.asarray(L.conv2d(ExecCtx.dense(), "stem", img, w, None,
                                stride=2, padding=3))

    old = L.S2D_STEM
    L.S2D_STEM = True
    try:
        idx = gridlib.exec_indices(jnp.ones((n, gh, gw), bool), gh * gw)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(img, idx, n, gh, gw)
        out = L.conv2d(ctx, "stem", pack, w, None, stride=2, padding=3)
    finally:
        L.S2D_STEM = old
    got = np.asarray(block_layout_to_dense(out.data, n, gh, gw))
    np.testing.assert_allclose(dense, got, rtol=1e-5, atol=1e-5)


def test_s2d_stem_fallback_many_channels():
    """cin > 4 (not a stem): must take the exchange path (same shape)."""
    n, gh, gw, bs, c, co = 1, 2, 2, 16, 8, 4
    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.randn(n, gh * bs, gw * bs, c).astype(np.float32))
    w = jnp.asarray(rs.randn(7, 7, c, co).astype(np.float32))
    old = L.S2D_STEM
    L.S2D_STEM = True
    try:
        idx = gridlib.exec_indices(jnp.ones((n, gh, gw), bool), gh * gw)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(img, idx, n, gh, gw)
        out = L.conv2d(ctx, "stem", pack, w, None, stride=2, padding=3)
        # exchange path creates the raw-strip canvas, not the .s2d one
        assert "stem" in ctx.canvases and "stem.s2d" not in ctx.canvases
    finally:
        L.S2D_STEM = old
    assert out.data.shape == (gh * gw, bs // 2, bs // 2, co)


def test_policy_fast_stem_conv4_matches_s2d():
    """POLICY_STEM_CONV4: k=4 s=4 conv == space-to-depth-4 + 1x1 conv
    (same weights, reshaped) to bf16 rounding."""
    import blockcopy_tpu.policy.net as N

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 64, 128, 26).astype(np.float32))
    p, _ = N.init_policy_net(jax.random.PRNGKey(3), 26, arch="fast")
    a = np.asarray(N._conv(N._space_to_depth(x, N.S2D), p["stem"], 1))
    b = np.asarray(N._conv_stem4(x, p["stem"]))
    scale = np.abs(a).max()
    np.testing.assert_allclose(a, b, atol=3e-3 * scale)


def _stem_params(rs, c_out=16):
    return {
        "conv1": {"w": jnp.asarray(rs.randn(7, 7, 3, c_out)
                                   .astype(np.float32))},
        "bn1": {"scale": jnp.asarray(rs.rand(c_out).astype(np.float32) + 0.5),
                "bias": jnp.asarray(rs.randn(c_out).astype(np.float32))},
    }


def _run_full_stem(plane_pool, frames, grids, params, n=1, gh=3, gw=4):
    from blockcopy_tpu.models.swiftnet import _stem

    old = L.STEM_PLANE_POOL
    L.STEM_PLANE_POOL = plane_pool
    try:
        outs = []
        canvases = {}
        building = True
        for frame, grid in zip(frames, grids):
            idx = gridlib.exec_indices(grid, int(grid.sum()))
            ctx = ExecCtx.blocked(idx, n, gh, gw, canvases, building=building)
            building = False
            pack = split_dense(frame, idx, n, gh, gw)
            out = _stem(ctx, pack, params)
            outs.append(np.asarray(out.data, np.float32))
            canvases = ctx.canvases
        return outs
    finally:
        L.STEM_PLANE_POOL = old


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_stem_plane_pool_matches_exchange(dtype):
    """STEM_PLANE_POOL: conv+BN+ReLU+maxpool fused in plane form must equal
    the exchange-path sequence across multi-frame temporal reuse."""
    n, gh, gw, bs = 1, 3, 4, 16
    rs = np.random.RandomState(0)
    frames = [jnp.asarray(rs.randn(n, gh * bs, gw * bs, 3).astype(dtype))
              for _ in range(4)]
    grids = [
        jnp.ones((n, gh, gw), bool),
        jnp.zeros((n, gh, gw), bool).at[0, ::2, 1::2].set(True),
        jnp.zeros((n, gh, gw), bool).at[0, 1, :].set(True),
        jnp.zeros((n, gh, gw), bool).at[0, :, 2].set(True),
    ]
    params = _stem_params(rs)
    ref = _run_full_stem(False, frames, grids, params)
    got = _run_full_stem(True, frames, grids, params)
    tol = 3e-2 if dtype == jnp.bfloat16 else 1e-5
    for t, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol,
                                   err_msg=f"frame {t}")


def test_stem_plane_pool_vs_dense_all_exec():
    """All blocks executed: fused plane-form stem == dense stem sequence."""
    n, gh, gw, bs = 1, 3, 4, 16
    rs = np.random.RandomState(5)
    img = jnp.asarray(rs.randn(n, gh * bs, gw * bs, 3).astype(np.float32))
    params = _stem_params(rs)

    dctx = ExecCtx.dense()
    d = L.conv2d(dctx, "c", img, params["conv1"]["w"], stride=2, padding=3)
    d = L.batch_norm(d, params["bn1"]["scale"], params["bn1"]["bias"])
    d = L.relu(d)
    # dense maxpool pads with -inf; post-ReLU values are >= 0 so the
    # blocked path's zero border matches only where the window has any
    # in-bounds pixel — true everywhere for p=1/k=3.
    dense = np.asarray(L.max_pool2d(dctx, "mp", d, 3, 2, 1))

    got = _run_full_stem(True, [img], [jnp.ones((n, gh, gw), bool)],
                         params)[0]
    got_dense = np.asarray(block_layout_to_dense(
        jnp.asarray(got), n, gh, gw))
    np.testing.assert_allclose(dense, got_dense, rtol=1e-5, atol=1e-5)


def test_policy_split_stem_matches_concat():
    """POLICY_SPLIT_STEM: per-source stem convs + analytic grid/offset terms
    == conv4s4 of the offset 26-ch concat (linearity; bf16 rounding)."""
    import blockcopy_tpu.policy.net as N

    rs = np.random.RandomState(7)
    frame = jnp.asarray(rs.rand(1, 256, 512, 3).astype(np.float32))
    fs = jnp.asarray(rs.rand(1, 64, 128, 3).astype(np.float32))
    outr = jnp.asarray(rs.rand(1, 64, 128, 19).astype(np.float32))
    grid = jnp.asarray((rs.rand(1, 2, 4) > 0.5).astype(np.float32))
    p, bn = N.init_policy_net(jax.random.PRNGKey(5), 26, arch="fast")

    x = N.assemble_policy_input(frame, fs, outr, grid, 128,
                                dtype=jnp.bfloat16)
    xs = N.assemble_policy_input_split(frame, fs, outr, grid, 128)
    a = np.asarray(N._conv_stem4(x, p["stem"]))
    b = np.asarray(N._conv_stem4_split(xs, p["stem"]))
    assert a.shape == b.shape == (1, 16, 32, 128)
    scale = max(np.abs(a).max(), 1e-6)
    np.testing.assert_allclose(a, b, atol=8e-3 * scale)

    # full apply accepts the tuple (logits through batch-stat BN stay close)
    la, _ = N.policy_net_apply(p, bn, x, update_stats=False, arch="fast")
    lb, _ = N.policy_net_apply(p, bn, xs, update_stats=False, arch="fast")
    la, lb = np.asarray(la), np.asarray(lb)
    lscale = max(np.abs(la).max(), 1e-6)
    np.testing.assert_allclose(la, lb, atol=3e-2 * lscale)


def test_policy_split_stem_stepper_smoke():
    """Fused stepper runs (incl. a REINFORCE update through the tuple cache)
    under POLICY_SPLIT_STEM=1 and produces finite outputs."""
    import blockcopy_tpu.policy.net as N
    from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
    from blockcopy_tpu.models.swiftnet import (
        SwiftNetConfig, init_swiftnet, make_apply_fn)

    old = N.POLICY_SPLIT_STEM
    N.POLICY_SPLIT_STEM = True
    try:
        cfg = SwiftNetConfig(backbone="resnet18", num_classes=19)
        params = init_swiftnet(jax.random.PRNGKey(0), cfg)
        scfg = StepperConfig(block_size=64, block_target=0.5,
                             train_interval=2, policy_arch="fast")
        frame_shape = (1, 128, 256, 3)
        stepper = FixedCapacityStepper(make_apply_fn(cfg), scfg, frame_shape,
                                       capacity=4)
        state = stepper.init_state(params, jax.random.PRNGKey(1))
        rs = np.random.RandomState(0)
        frame = jnp.asarray(rs.rand(*frame_shape).astype(np.float32))
        state = stepper.first_step(params, state, frame)
        for _ in range(5):
            state = stepper.step(params, state, frame)
        out = np.asarray(stepper.fetch_outputs(state), np.float32)
        assert np.isfinite(out).all()
        leaves = jax.tree_util.tree_leaves(state["policy"]["params"])
        assert all(np.isfinite(np.asarray(l, np.float32)).all()
                   for l in leaves)
    finally:
        N.POLICY_SPLIT_STEM = old
