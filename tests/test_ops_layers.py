"""Blocked-vs-dense equivalence per layer.

The central correctness property of the whole framework: with *all* blocks
executed, a blocked padded op (conv / maxpool) must reproduce the dense op
exactly, because the halo exchange reconstructs the dense neighborhood
(reference guarantee of the blockpad machinery, SURVEY.md §4 "policy `all`
must reproduce the dense model").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import ExecCtx, split_dense, block_layout_to_dense
from blockcopy_tpu.ops import layers as L


def make_ctx(n, gh, gw, capacity=None):
    total = n * gh * gw
    grid = jnp.ones((n, gh, gw), bool)
    idx = gridlib.exec_indices(grid, capacity or total)
    return ExecCtx.blocked(idx, n, gh, gw, {}, building=True)


def rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


class TestConvEquivalence:
    @pytest.mark.parametrize(
        "k,stride,dilation,pad",
        [(3, 1, 1, 1), (3, 2, 1, 1), (7, 2, 1, 3), (1, 1, 1, 0), (3, 1, 2, 2)],
    )
    def test_all_exec_matches_dense(self, k, stride, dilation, pad):
        n, gh, gw, bs, cin, cout = 1, 2, 3, 8, 4, 6
        x = rand((n, gh * bs, gw * bs, cin), 1)
        w = rand((k, k, cin, cout), 2) * 0.2
        b = rand((cout,), 3) * 0.1

        dense = L.conv2d(ExecCtx.dense(), "c", x, w, b, stride=stride,
                         dilation=dilation, padding=pad)

        ctx = make_ctx(n, gh, gw)
        pack = split_dense(x, ctx.idx, n, gh, gw)
        out = L.conv2d(ctx, "c", pack, w, b, stride=stride,
                       dilation=dilation, padding=pad)
        # reassemble dense from blocks
        canvas = jnp.zeros(
            (n * gh * gw + 1,) + out.data.shape[1:], out.data.dtype
        ).at[out.idx].set(out.data, mode="drop")
        got = block_layout_to_dense(canvas, n, gh, gw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)

    def test_partial_exec_uses_stale_neighbor_features(self):
        """Frame 2 executes a subset; halo pixels from skipped neighbors must
        come from frame 1's stored features (temporal transfer semantics)."""
        n, gh, gw, bs, c = 1, 1, 2, 8, 3
        total = n * gh * gw
        w = rand((3, 3, c, c), 5) * 0.2
        f1 = rand((n, bs, gw * bs, c), 6)
        f2 = rand((n, bs, gw * bs, c), 7)

        ctx = make_ctx(n, gh, gw)
        p1 = split_dense(f1, ctx.idx, n, gh, gw)
        L.conv2d(ctx, "c", p1, w, padding=1)
        canvases = ctx.canvases

        # frame 2: execute only block 0
        grid = jnp.array([[[True, False]]])
        idx = gridlib.exec_indices(grid, 1)
        ctx2 = ExecCtx.blocked(idx, n, gh, gw, canvases)
        p2 = split_dense(f2, idx, n, gh, gw)
        out = L.conv2d(ctx2, "c", p2, w, padding=1)

        # expected: dense conv over [f2 block0 | f1 block1]
        mixed = jnp.concatenate([f2[:, :, :bs], f1[:, :, bs:]], axis=2)
        dense = L.conv2d(ExecCtx.dense(), "c", mixed, w, padding=1)
        np.testing.assert_allclose(
            np.asarray(out.data[0]), np.asarray(dense[0, :, :bs]),
            rtol=1e-5, atol=1e-5,
        )


class TestPoolEquivalence:
    def test_maxpool_all_exec_matches_dense_nonneg(self):
        n, gh, gw, bs, c = 1, 2, 2, 8, 3
        x = jnp.abs(rand((n, gh * bs, gw * bs, c), 8))  # post-ReLU regime
        dense = L.max_pool2d(ExecCtx.dense(), "p", x)
        ctx = make_ctx(n, gh, gw)
        pack = split_dense(x, ctx.idx, n, gh, gw)
        out = L.max_pool2d(ctx, "p", pack)
        canvas = jnp.zeros(
            (n * gh * gw + 1,) + out.data.shape[1:], out.data.dtype
        ).at[out.idx].set(out.data, mode="drop")
        got = block_layout_to_dense(canvas, n, gh, gw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                   rtol=1e-6, atol=1e-6)


class TestNorms:
    def test_group_norm_blocked_matches_dense_all_exec(self):
        n, gh, gw, bs, c, g = 1, 2, 2, 4, 8, 4
        x = rand((n, gh * bs, gw * bs, c), 9)
        gamma = jnp.ones((c,))
        beta = jnp.zeros((c,))
        dense = L.group_norm(x, g, gamma, beta)
        ctx = make_ctx(n, gh, gw)
        pack = split_dense(x, ctx.idx, n, gh, gw)
        out = L.group_norm(pack, g, gamma, beta)
        canvas = jnp.zeros(
            (n * gh * gw + 1,) + out.data.shape[1:], out.data.dtype
        ).at[out.idx].set(out.data, mode="drop")
        got = block_layout_to_dense(canvas, n, gh, gw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                   rtol=1e-4, atol=1e-4)

    def test_group_norm_masks_padding_slots(self):
        """Stats must ignore capacity-padding slots (zeros would bias them)."""
        n, gh, gw, bs, c, g = 1, 2, 2, 4, 8, 4
        x = rand((n, gh * bs, gw * bs, c), 10) + 3.0
        total = n * gh * gw
        grid = jnp.ones((n, gh, gw), bool)
        idx_full = gridlib.exec_indices(grid, total)
        idx_padded = jnp.concatenate(
            [idx_full, jnp.full((4,), total, jnp.int32)]
        )
        p_full = split_dense(x, idx_full, n, gh, gw)
        p_padded = split_dense(x, idx_padded, n, gh, gw)
        out_full = L.group_norm(p_full, g, jnp.ones((c,)), jnp.zeros((c,)))
        out_padded = L.group_norm(p_padded, g, jnp.ones((c,)), jnp.zeros((c,)))
        np.testing.assert_allclose(
            np.asarray(out_full.data), np.asarray(out_padded.data[:total]),
            rtol=1e-5, atol=1e-5,
        )

    def test_batch_norm_affine(self):
        x = rand((1, 4, 4, 3), 11)
        scale = jnp.array([1.0, 2.0, 0.5])
        bias = jnp.array([0.0, -1.0, 3.0])
        out = L.batch_norm(x, scale, bias)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x) * np.asarray(scale) + np.asarray(bias),
            rtol=1e-6,
        )


class TestResize:
    def test_upsample2x_shapes(self):
        x = rand((2, 4, 6, 3), 12)
        y = L.upsample2x(x)
        assert y.shape == (2, 8, 12, 3)

    def test_resize_nearest_matches_floor_indexing(self):
        x = rand((1, 8, 8, 2), 13)
        y = L.resize_nearest(x, (4, 4))
        np.testing.assert_array_equal(
            np.asarray(y), np.asarray(x)[:, ::2, ::2]
        )

    def test_adaptive_pools(self):
        x = rand((1, 8, 16, 3), 14)
        a = L.adaptive_avg_pool2d(x, (2, 4))
        m = L.adaptive_max_pool2d(x, (2, 4))
        assert a.shape == (1, 2, 4, 3) and m.shape == (1, 2, 4, 3)
        np.testing.assert_allclose(
            float(a[0, 0, 0, 0]),
            float(np.asarray(x)[0, :4, :4, 0].mean()), rtol=1e-5,
        )
        assert float(m[0, 0, 0, 0]) == pytest.approx(
            float(np.asarray(x)[0, :4, :4, 0].max())
        )


class TestConvTranspose:
    def test_matches_torch_semantics(self):
        torch = pytest.importorskip("torch")
        n, h, w, cin, cout, k, s = 1, 5, 6, 3, 4, 4, 2
        x = rand((n, h, w, cin), 15)
        wgt = rand((k, k, cin, cout), 16) * 0.2
        y = L.conv_transpose2d(ExecCtx.dense(), "t", x, wgt, stride=s,
                               padding=1)
        tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
        tw = torch.tensor(np.asarray(wgt).transpose(2, 3, 0, 1))  # I,O,H,W
        ty = torch.nn.functional.conv_transpose2d(tx, tw, stride=s, padding=1)
        np.testing.assert_allclose(
            np.asarray(y), ty.numpy().transpose(0, 2, 3, 1), rtol=1e-4,
            atol=1e-4,
        )


class TestReviewRegressions:
    def test_group_norm_blocked_per_image_stats_batch2(self):
        """Blocked GN must use per-image statistics for N>1, matching the
        dense path (regression: stats were pooled across the batch)."""
        n, gh, gw, bs, c, g = 2, 2, 2, 4, 8, 4
        x = rand((n, gh * bs, gw * bs, c), 21)
        # make the two images statistically very different
        x = x.at[1].add(5.0)
        gamma = jnp.ones((c,)) * 1.3
        beta = jnp.zeros((c,)) + 0.1
        dense = L.group_norm(x, g, gamma, beta)
        ctx = make_ctx(n, gh, gw)
        pack = split_dense(x, ctx.idx, n, gh, gw)
        out = L.group_norm(pack, g, gamma, beta)
        canvas = jnp.zeros(
            (n * gh * gw + 1,) + out.data.shape[1:], out.data.dtype
        ).at[out.idx].set(out.data, mode="drop")
        got = block_layout_to_dense(canvas, n, gh, gw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                   rtol=1e-4, atol=1e-4)

    def test_adaptive_pools_non_dividing(self):
        """torch adaptive-pool bins for sizes that do not divide evenly
        (regression: assert crashed legal --res values)."""
        import torch
        import torch.nn.functional as F

        x = rand((1, 9, 14, 3), 22)
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        for oh, ow in [(2, 4), (4, 5), (8, 16)]:
            a = L.adaptive_avg_pool2d(x, (oh, ow))
            m = L.adaptive_max_pool2d(x, (oh, ow))
            ra = F.adaptive_avg_pool2d(xt, (oh, ow)).permute(0, 2, 3, 1)
            rm = F.adaptive_max_pool2d(xt, (oh, ow)).permute(0, 2, 3, 1)
            np.testing.assert_allclose(np.asarray(a), ra.numpy(),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(m), rm.numpy(),
                                       rtol=1e-5, atol=1e-5)
