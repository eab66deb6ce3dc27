"""SwiftNet model tests: dense forward, blocked-all ≈ dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import ExecCtx, block_layout_to_dense, split_dense
from blockcopy_tpu.models.swiftnet import (
    SwiftNetConfig,
    init_swiftnet,
    make_apply_fn,
    swiftnet_apply,
)

CFG = SwiftNetConfig(backbone="resnet18", num_classes=19)
H, W, BS = 256, 512, 64


def _params():
    return init_swiftnet(jax.random.PRNGKey(0), CFG)


class TestDense:
    def test_output_shape_stride4(self):
        params = _params()
        x = jnp.asarray(np.random.RandomState(0).randn(1, H, W, 3),
                        jnp.float32)
        out = swiftnet_apply(params, x, ExecCtx.dense(), CFG)
        assert out.shape == (1, H // 4, W // 4, 19)
        assert bool(jnp.isfinite(out).all())


class TestBlockedAllOracle:
    def test_blocked_all_close_to_dense(self):
        """Policy `all` must reproduce the dense model (SURVEY.md §4).

        Exact through the backbone (halo == dense neighborhoods); the decoder
        upsamples per block — the *reference's* semantics too (INTERPOLATE
        runs on the packed tensor) — so block-seam pixels may differ.  With
        random weights (near-uniform logits, worst case for argmax) agreement
        must still be high; with trained weights the published gap is ~1 mIoU.
        """
        bs = 128  # production-relative geometry: stride-32 blocks are 4x4
        params = _params()
        x = jnp.asarray(np.random.RandomState(1).randn(1, H, W, 3),
                        jnp.float32)
        dense = swiftnet_apply(params, x, ExecCtx.dense(), CFG)

        n, gh, gw = 1, H // bs, W // bs
        total = n * gh * gw
        idx = gridlib.exec_indices(jnp.ones((n, gh, gw), bool), total)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(x, idx, n, gh, gw)
        out = swiftnet_apply(params, pack, ctx, CFG)
        canvas = jnp.zeros(
            (total + 1,) + out.data.shape[1:], out.data.dtype
        ).at[out.idx].set(out.data, mode="drop")
        blocked = block_layout_to_dense(canvas, n, gh, gw)

        assert blocked.shape == dense.shape
        a = np.asarray(jnp.argmax(dense, -1))
        b = np.asarray(jnp.argmax(blocked, -1))
        agreement = (a == b).mean()
        assert agreement > 0.9, agreement

    def test_blocked_all_deterministic_across_frames(self):
        """Same input, all-exec, two frames -> bit-identical outputs."""
        bs = 128
        params = _params()
        x = jnp.asarray(np.random.RandomState(3).randn(1, H, W, 3),
                        jnp.float32)
        n, gh, gw = 1, H // bs, W // bs
        total = n * gh * gw
        idx = gridlib.exec_indices(jnp.ones((n, gh, gw), bool), total)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(x, idx, n, gh, gw)
        out1 = swiftnet_apply(params, pack, ctx, CFG)
        ctx2 = ExecCtx.blocked(idx, n, gh, gw, ctx.canvases)
        out2 = swiftnet_apply(params, pack, ctx2, CFG)
        np.testing.assert_array_equal(np.asarray(out1.data),
                                      np.asarray(out2.data))

    def test_backbone_blocked_all_exact(self):
        """Backbone features (no per-block upsample) must match densely."""
        from blockcopy_tpu.models.swiftnet import resnet_forward_down

        params = _params()["backbone"]
        x = jnp.asarray(np.random.RandomState(2).randn(1, H, W, 3),
                        jnp.float32)
        dense_feats = resnet_forward_down(x=x, params=params,
                                          ctx=ExecCtx.dense(),
                                          cfg=CFG.resnet)
        n, gh, gw = 1, H // BS, W // BS
        total = n * gh * gw
        idx = gridlib.exec_indices(jnp.ones((n, gh, gw), bool), total)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(x, idx, n, gh, gw)
        feats = resnet_forward_down(x=pack, params=params, ctx=ctx,
                                    cfg=CFG.resnet)
        for i, (d, f) in enumerate(zip(dense_feats, feats)):
            canvas = jnp.zeros(
                (total + 1,) + f.data.shape[1:], f.data.dtype
            ).at[f.idx].set(f.data, mode="drop")
            got = block_layout_to_dense(canvas, n, gh, gw)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(d), rtol=2e-4, atol=2e-4,
                err_msg=f"stage {i}",
            )
