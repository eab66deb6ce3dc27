"""Inherited-ops parity: sigmoid focal loss / RoIAlign vs torchvision
(when available) or analytic expectations."""

import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.ops.extras import roi_align, roi_pool, sigmoid_focal_loss


class TestFocalLoss:
    def test_matches_torchvision_formula(self):
        torch = pytest.importorskip("torch")
        rs = np.random.RandomState(0)
        logits = rs.randn(8, 3).astype(np.float32)
        targets = rs.randint(0, 4, (8,))  # 0 = background
        ours = np.asarray(sigmoid_focal_loss(jnp.asarray(logits),
                                             jnp.asarray(targets)))
        # reference formula (mmdet CUDA ext): one-vs-all focal BCE
        t = (targets[:, None] == np.arange(1, 4)[None, :]).astype(np.float32)
        lt = torch.tensor(logits)
        p = torch.sigmoid(lt).numpy()
        ce_pos = -np.log(np.clip(p, 1e-12, 1))
        ce_neg = -np.log(np.clip(1 - p, 1e-12, 1))
        ref = t * (1 - p) ** 2 * ce_pos * 0.25 + \
            (1 - t) * p ** 2 * ce_neg * 0.75
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_background_only_negative_term(self):
        logits = jnp.array([[-10.0, -10.0]])
        loss = sigmoid_focal_loss(logits, jnp.array([0]))
        assert float(loss.sum()) < 1e-4  # confident background: tiny loss


class TestRoiAlign:
    def test_constant_region(self):
        feat = jnp.ones((1, 16, 16, 4)) * 3.0
        rois = jnp.array([[0, 2.0, 2.0, 10.0, 10.0]])
        out = roi_align(feat, rois, out_size=4)
        assert out.shape == (1, 4, 4, 4)
        np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-6)

    def test_matches_torchvision(self):
        tv = pytest.importorskip("torchvision")
        import torch
        rs = np.random.RandomState(1)
        feat = rs.randn(1, 12, 16, 3).astype(np.float32)
        rois = np.array([[0, 1.0, 2.0, 11.0, 9.0],
                         [0, 0.0, 0.0, 15.0, 11.0]], np.float32)
        ours = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                    out_size=5, spatial_scale=1.0,
                                    sampling_ratio=2))
        ref = tv.ops.roi_align(
            torch.tensor(feat.transpose(0, 3, 1, 2)), torch.tensor(rois),
            output_size=5, spatial_scale=1.0, sampling_ratio=2,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    def test_roi_pool_picks_max(self):
        feat = jnp.zeros((1, 8, 8, 1)).at[0, 3, 3, 0].set(9.0)
        rois = jnp.array([[0, 0.0, 0.0, 7.0, 7.0]])
        out = roi_pool(feat, rois, out_size=2)
        assert float(np.asarray(out).max()) == 9.0


class TestDeformConv:
    def test_zero_offsets_equal_regular_conv(self):
        """DCN with zero offsets must reproduce a plain 3x3 conv exactly."""
        from blockcopy_tpu.core.blocked import ExecCtx
        from blockcopy_tpu.ops.extras import deform_conv2d
        from blockcopy_tpu.ops.layers import conv2d

        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(2, 10, 12, 6).astype(np.float32))
        w = jnp.asarray(rs.randn(3, 3, 6, 4).astype(np.float32) * 0.2)
        off = jnp.zeros((2, 10, 12, 18))
        got = deform_conv2d(x, off, w, padding=1)
        want = conv2d(ExecCtx.dense(), "c", x, w, padding=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_integer_offsets_shift_sampling(self):
        """An integer (+1, +1) offset on every tap equals conv over the
        shifted image."""
        from blockcopy_tpu.core.blocked import ExecCtx
        from blockcopy_tpu.ops.extras import deform_conv2d
        from blockcopy_tpu.ops.layers import conv2d

        rs = np.random.RandomState(1)
        x = np.zeros((1, 12, 12, 3), np.float32)
        x[:, 2:-2, 2:-2] = rs.randn(1, 8, 8, 3)
        w = jnp.asarray(rs.randn(3, 3, 3, 2).astype(np.float32) * 0.2)
        off = np.zeros((1, 12, 12, 18), np.float32)
        off[..., 0::2] = 1.0  # dy = +1 everywhere
        off[..., 1::2] = 1.0  # dx = +1
        got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), w, padding=1)
        shifted = np.zeros_like(x)
        shifted[:, :-1, :-1] = x[:, 1:, 1:]
        want = conv2d(ExecCtx.dense(), "c", jnp.asarray(shifted), w,
                      padding=1)
        # rows/cols touching the zero-padding differ; compare the interior
        np.testing.assert_allclose(np.asarray(got)[:, :-2, :-2],
                                   np.asarray(want)[:, :-2, :-2],
                                   rtol=1e-4, atol=1e-4)

    def test_modulated_mask_scales_taps(self):
        """DCNv2: mask=0.5 on all taps halves the zero-offset output."""
        from blockcopy_tpu.ops.extras import deform_conv2d

        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(1, 8, 8, 4).astype(np.float32))
        w = jnp.asarray(rs.randn(3, 3, 4, 5).astype(np.float32) * 0.2)
        off = jnp.zeros((1, 8, 8, 18))
        full = deform_conv2d(x, off, w, padding=1)
        half = deform_conv2d(x, off, w, padding=1,
                             mask=jnp.full((1, 8, 8, 9), 0.5))
        np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5,
                                   rtol=1e-4, atol=1e-5)

    def test_naive_numpy_parity_fractional_offsets(self):
        """Fractional offsets vs a naive numpy implementation."""
        from blockcopy_tpu.ops.extras import deform_conv2d

        rs = np.random.RandomState(3)
        n, h, wdt, c, cout, k = 1, 6, 7, 2, 3, 3
        x = rs.randn(n, h, wdt, c).astype(np.float32)
        w = (rs.randn(k, k, c, cout) * 0.3).astype(np.float32)
        off = (rs.randn(n, h, wdt, k * k * 2) * 0.7).astype(np.float32)
        got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off),
                                       jnp.asarray(w), padding=1))

        def sample(img, y, xq):
            y0, x0 = int(np.floor(y)), int(np.floor(xq))
            out = np.zeros(c, np.float32)
            for dy in (0, 1):
                for dx in (0, 1):
                    yy, xx = y0 + dy, x0 + dx
                    wgt = ((1 - abs(y - yy)) * (1 - abs(xq - xx)))
                    if 0 <= yy < h and 0 <= xx < wdt and wgt > 0:
                        out += img[yy, xx] * wgt
            return out

        want = np.zeros((n, h, wdt, cout), np.float32)
        for oy in range(h):
            for ox in range(wdt):
                for t in range(k * k):
                    ky, kx = t // k, t % k
                    y = oy - 1 + ky + off[0, oy, ox, 2 * t]
                    xq = ox - 1 + kx + off[0, oy, ox, 2 * t + 1]
                    v = sample(x[0], y, xq)
                    want[0, oy, ox] += v @ w[ky, kx]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestMaskedConv:
    def test_equals_masked_dense_conv(self):
        from blockcopy_tpu.core.blocked import ExecCtx
        from blockcopy_tpu.ops.extras import masked_conv2d
        from blockcopy_tpu.ops.layers import conv2d

        rs = np.random.RandomState(4)
        x = jnp.asarray(rs.randn(1, 8, 10, 3).astype(np.float32))
        w = jnp.asarray(rs.randn(3, 3, 3, 2).astype(np.float32) * 0.2)
        mask = jnp.asarray((rs.rand(1, 8, 10) > 0.5).astype(np.float32))
        got = masked_conv2d(ExecCtx.dense(), "m", x, w, mask, padding=1)
        want = conv2d(ExecCtx.dense(), "c", x, w, padding=1)
        want = np.asarray(want) * np.asarray(mask)[..., None]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-6)
