"""Property tests for the block engine core.

The reference ships no tests; these encode the invariants its debug switches
probed by hand (SURVEY.md §4): combine∘split == identity at 100% exec,
skipped blocks equal the previous frame, halo exchange == dense conv
neighborhood semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import (
    BlockPack,
    alloc_canvas,
    block_layout_to_dense,
    dense_to_block_layout,
    halo_gather,
    scatter_pack,
    split_dense,
)


def rng(seed=0):
    return np.random.RandomState(seed)


def make_grid_all(n, gh, gw):
    return jnp.ones((n, gh, gw), dtype=bool)


class TestLayout:
    def test_roundtrip(self):
        x = jnp.asarray(rng().randn(2, 8, 12, 5).astype(np.float32))
        blocks = dense_to_block_layout(x, 2, 3)
        assert blocks.shape == (2 * 2 * 3, 4, 4, 5)
        back = block_layout_to_dense(blocks, 2, 2, 3)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_block_content(self):
        x = jnp.arange(4 * 6).reshape(1, 4, 6, 1).astype(jnp.float32) % 97
        blocks = dense_to_block_layout(x, 2, 3)
        np.testing.assert_array_equal(
            np.asarray(blocks[4, :, :, 0]), np.asarray(x[0, 2:4, 2:4, 0])
        )


class TestSplitCombine:
    def test_combine_of_split_all_exec_is_identity(self):
        n, gh, gw, bs, c = 1, 3, 4, 8, 6
        x = jnp.asarray(rng(1).randn(n, gh * bs, gw * bs, c).astype(np.float32))
        grid = make_grid_all(n, gh, gw)
        idx = gridlib.exec_indices(grid, n * gh * gw)
        pack = split_dense(x, idx, n, gh, gw)
        canvas = alloc_canvas(n, gh, gw, bs, c, x.dtype)
        canvas = scatter_pack(canvas, pack)
        out = block_layout_to_dense(canvas, n, gh, gw)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_skipped_blocks_keep_previous_value(self):
        n, gh, gw, bs, c = 1, 2, 2, 4, 3
        total = n * gh * gw
        prev = jnp.asarray(rng(2).randn(n, gh * bs, gw * bs, c).astype(np.float32))
        cur = jnp.asarray(rng(3).randn(n, gh * bs, gw * bs, c).astype(np.float32))
        canvas = alloc_canvas(n, gh, gw, bs, c, prev.dtype)
        canvas = scatter_pack(
            canvas, split_dense(prev, gridlib.exec_indices(make_grid_all(n, gh, gw), total), n, gh, gw)
        )
        # execute only blocks 1 and 2 on frame 2
        grid = jnp.array([[[False, True], [True, False]]])
        idx = gridlib.exec_indices(grid, 2)
        canvas = scatter_pack(canvas, split_dense(cur, idx, n, gh, gw))
        out = np.asarray(block_layout_to_dense(canvas, n, gh, gw))
        # executed region == current frame
        np.testing.assert_array_equal(out[0, :bs, bs:], np.asarray(cur)[0, :bs, bs:])
        np.testing.assert_array_equal(out[0, bs:, :bs], np.asarray(cur)[0, bs:, :bs])
        # skipped region == previous frame
        np.testing.assert_array_equal(out[0, :bs, :bs], np.asarray(prev)[0, :bs, :bs])
        np.testing.assert_array_equal(out[0, bs:, bs:], np.asarray(prev)[0, bs:, bs:])

    def test_capacity_padding_slots_are_inert(self):
        n, gh, gw, bs, c = 1, 2, 2, 4, 3
        total = n * gh * gw
        x = jnp.asarray(rng(4).randn(n, gh * bs, gw * bs, c).astype(np.float32))
        grid = jnp.array([[[True, False], [False, False]]])
        idx = gridlib.exec_indices(grid, 3)  # capacity 3, only 1 real
        assert int(idx[0]) == 0 and int(idx[1]) == total and int(idx[2]) == total
        pack = split_dense(x, idx, n, gh, gw)
        # padded slots gather zeros
        np.testing.assert_array_equal(np.asarray(pack.data[1]), 0)
        canvas = alloc_canvas(n, gh, gw, bs, c, x.dtype)
        before = np.asarray(canvas)
        canvas = scatter_pack(canvas, pack)
        after = np.asarray(canvas)
        # sentinel row still zero, untouched rows still zero
        np.testing.assert_array_equal(after[-1], 0)
        np.testing.assert_array_equal(after[1:total], before[1:total])


class TestHaloGather:
    @pytest.mark.parametrize("pad", [1, 2, 3])
    def test_halo_equals_dense_padding_all_exec(self, pad):
        """With every block executed, halo_gather(block) must equal the dense
        image zero-padded then cropped around that block — the exact guarantee
        the reference repad kernel provides (``utils/blockpad.py:77-156``)."""
        n, gh, gw, bs, c = 2, 3, 4, 8, 5
        total = n * gh * gw
        x = jnp.asarray(rng(5).randn(n, gh * bs, gw * bs, c).astype(np.float32))
        idx = gridlib.exec_indices(make_grid_all(n, gh, gw), total)
        pack = split_dense(x, idx, n, gh, gw)
        canvas = alloc_canvas(n, gh, gw, bs, c, x.dtype)
        canvas = scatter_pack(canvas, pack)
        padded = np.asarray(halo_gather(canvas, idx, pad, n, gh, gw))
        dense_padded = np.pad(
            np.asarray(x), ((0, 0), (pad, pad), (pad, pad), (0, 0))
        )
        for k in range(total):
            b, g = divmod(k, gh * gw)
            gy, gx = divmod(g, gw)
            ref = dense_padded[
                b,
                gy * bs : gy * bs + bs + 2 * pad,
                gx * bs : gx * bs + bs + 2 * pad,
            ]
            np.testing.assert_array_equal(padded[k], ref, err_msg=f"block {k}")

    def test_halo_mixes_fresh_and_stale_neighbors(self):
        """Halo of an executed block must read same-frame values from executed
        neighbors and previous-frame values from skipped neighbors."""
        n, gh, gw, bs, c, pad = 1, 1, 3, 4, 2, 1
        total = n * gh * gw
        prev = jnp.asarray(rng(6).randn(n, gh * bs, gw * bs, c).astype(np.float32))
        cur = jnp.asarray(rng(7).randn(n, gh * bs, gw * bs, c).astype(np.float32))
        canvas = alloc_canvas(n, gh, gw, bs, c, prev.dtype)
        canvas = scatter_pack(
            canvas,
            split_dense(prev, gridlib.exec_indices(make_grid_all(n, gh, gw), total), n, gh, gw),
        )
        # frame 2: execute blocks 0 and 1; block 2 skipped
        grid = jnp.array([[[True, True, False]]])
        idx = gridlib.exec_indices(grid, 2)
        canvas = scatter_pack(canvas, split_dense(cur, idx, n, gh, gw))
        padded = np.asarray(halo_gather(canvas, idx, pad, n, gh, gw))
        # block 1 (middle): left neighbor executed -> current values
        np.testing.assert_array_equal(
            padded[1][pad:-pad, :pad], np.asarray(cur)[0, :, bs - pad : bs]
        )
        # right neighbor skipped -> previous-frame values
        np.testing.assert_array_equal(
            padded[1][pad:-pad, -pad:], np.asarray(prev)[0, :, 2 * bs : 2 * bs + pad]
        )
        # top/bottom are image border -> zeros
        np.testing.assert_array_equal(padded[1][:pad], 0)
        np.testing.assert_array_equal(padded[1][-pad:], 0)


class TestGridUtils:
    def test_exec_indices_order_and_fill(self):
        grid = jnp.array([[[True, False], [True, True]]])
        idx = np.asarray(gridlib.exec_indices(grid, 4))
        assert list(idx) == [0, 2, 3, 4]

    def test_quantize_grid_rounds_up(self):
        key = jax.random.PRNGKey(0)
        grid = jnp.zeros((1, 4, 8), bool).at[0, 0, :3].set(True)
        q = gridlib.quantize_grid(key, grid, 1 / 16)  # multiple = 2
        n = int(jnp.sum(q))
        assert n == 4
        # original executed blocks stay enabled
        assert bool(jnp.all(q[grid]))

    def test_quantize_grid_exact_multiple_unchanged_count(self):
        key = jax.random.PRNGKey(1)
        grid = jnp.zeros((1, 4, 8), bool).at[0, 0, :4].set(True)
        q = gridlib.quantize_grid(key, grid, 1 / 16)
        assert int(jnp.sum(q)) == 4
        np.testing.assert_array_equal(np.asarray(q), np.asarray(grid))

    def test_capacity_for_count(self):
        assert gridlib.capacity_for_count(0, 128, 1 / 16) == 0
        assert gridlib.capacity_for_count(1, 128, 1 / 16) == 8
        assert gridlib.capacity_for_count(8, 128, 1 / 16) == 8
        assert gridlib.capacity_for_count(9, 128, 1 / 16) == 16
        assert gridlib.capacity_for_count(128, 128, 1 / 16) == 128

    def test_neighbor_indices_interior_and_border(self):
        n, gh, gw = 1, 3, 3
        total = n * gh * gw
        idx = jnp.array([4, 0], dtype=jnp.int32)  # center and top-left corner
        nbr = np.asarray(gridlib.neighbor_indices(idx, n, gh, gw))
        assert list(nbr[0]) == [0, 1, 2, 3, 5, 6, 7, 8]
        # corner: TL,T,TR,L all OOB -> sentinel
        assert list(nbr[1]) == [total, total, total, total, 1, total, 3, 4]


class TestCanvasGuards:
    def test_store_dense_rejects_double_store(self):
        """Two store_dense calls with one name in one frame = two call
        sites silently sharing a temporal canvas (e.g. two to_dense calls
        left on the default name) — must fail loudly at trace time."""
        from blockcopy_tpu.core.blocked import ExecCtx

        n, gh, gw = 1, 2, 2
        idx = jnp.arange(n * gh * gw, dtype=jnp.int32)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(
            jnp.zeros((n, 8, 8, 3)), idx, n, gh, gw)
        ctx.store_dense("out", pack)
        with pytest.raises(ValueError, match="already stored"):
            ctx.store_dense("out", pack)
        # distinct names are fine
        ctx.store_dense("out2", pack)
