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
