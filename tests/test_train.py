"""CSP offline training stack: GT maps, losses, train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.models.csp import CSPConfig, init_csp
from blockcopy_tpu.tasks.detection import train as T

H, W = 256, 512
CFG = CSPConfig()


class TestGTMaps:
    def test_maps_structure(self):
        gts = np.array([[100.0, 50.0, 140.0, 150.0]])
        pos, scale, offset = T.calc_gt_center(gts, None, (H, W))
        assert pos.shape == (H // 4, W // 4, 3)
        # center pixel marked
        cy, cx = int((50 + 150) / 2 / 4), int((100 + 140) / 2 / 4)
        assert pos[cy, cx, 2] == 1
        assert scale[cy, cx, 1] == 1
        assert scale[cy, cx, 0] == pytest.approx(np.log((150 - 50) / 4))
        assert offset[cy, cx, 2] == 1
        # gaussian peak inside box, zero outside
        assert pos[cy, cx, 0] > 0.5
        assert pos[5, 5, 0] == 0

    def test_ignore_region_masks_keep(self):
        igs = np.array([[0.0, 0.0, 40.0, 40.0]])
        pos, _, _ = T.calc_gt_center(np.zeros((0, 4)), igs, (H, W))
        assert pos[2, 2, 1] == 0
        assert pos[50, 50, 1] == 1

    def test_empty_gts(self):
        pos, scale, offset = T.calc_gt_center(np.zeros((0, 4)), None, (H, W))
        assert pos[..., 2].sum() == 0 and scale.sum() == 0


class TestLosses:
    def _maps(self):
        gts = np.array([[100.0, 50.0, 140.0, 150.0],
                        [300.0, 80.0, 340.0, 180.0]])
        pos, scale, offset = T.calc_gt_center(gts, None, (H, W))
        return (jnp.asarray(pos)[None], jnp.asarray(scale)[None],
                jnp.asarray(offset)[None])

    def test_perfect_prediction_low_loss(self):
        pos, scale, offset = self._maps()
        h4, w4 = H // 4, W // 4
        cls = jnp.where(pos[..., 2:3] > 0, 12.0, -12.0)
        reg = scale[..., 0:1]
        off = offset[..., :2]
        losses = T.csp_loss((cls, reg, off), (pos, scale, offset))
        assert float(losses["loss_cls"]) < 1e-3
        assert float(losses["loss_bbox"]) < 1e-6
        assert float(losses["loss_offset"]) < 1e-6

    def test_wrong_prediction_higher_loss(self):
        pos, scale, offset = self._maps()
        good = T.csp_loss(
            (jnp.where(pos[..., 2:3] > 0, 12.0, -12.0), scale[..., 0:1],
             offset[..., :2]), (pos, scale, offset))
        bad = T.csp_loss(
            (jnp.zeros_like(pos[..., :1]), jnp.zeros_like(scale[..., :1]),
             jnp.zeros_like(offset[..., :2])), (pos, scale, offset))
        assert sum(map(float, bad.values())) > sum(map(float, good.values()))

    def test_loss_weights_scale_terms(self):
        # validate_detection.py's short-run regime up-weights cls 100x;
        # each weight must scale exactly its own term
        pos, scale, offset = self._maps()
        outs = (jnp.zeros_like(pos[..., :1]), jnp.zeros_like(scale[..., :1]),
                jnp.ones_like(offset[..., :2]))
        base = T.csp_loss(outs, (pos, scale, offset))
        scaled = T.csp_loss(outs, (pos, scale, offset),
                            weights=(1.0, 2.0, 0.2))
        np.testing.assert_allclose(float(scaled["loss_cls"]),
                                   float(base["loss_cls"]) * 100, rtol=1e-6)
        np.testing.assert_allclose(float(scaled["loss_bbox"]),
                                   float(base["loss_bbox"]) * 2, rtol=1e-6)
        np.testing.assert_allclose(float(scaled["loss_offset"]),
                                   float(base["loss_offset"]) * 2, rtol=1e-6)


class TestTrainStep:
    def test_loss_decreases(self):
        params = init_csp(jax.random.PRNGKey(0), CFG)
        tcfg = T.TrainConfig(lr=1e-3, warmup_iters=0, iters_per_epoch=10)
        state = T.init_train_state(params, tcfg)
        step = jax.jit(T.make_train_step(CFG, tcfg))
        rs = np.random.RandomState(0)
        img = jnp.asarray(rs.randn(1, H, W, 3).astype(np.float32))
        gts = np.array([[100.0, 50.0, 140.0, 150.0]])
        pos, scale, offset = T.calc_gt_center(gts, None, (H, W))
        maps = (jnp.asarray(pos)[None], jnp.asarray(scale)[None],
                jnp.asarray(offset)[None])
        losses0 = None
        for i in range(6):
            state, losses = step(state, img, maps)
            if losses0 is None:
                losses0 = float(losses["loss_total"])
        assert float(losses["loss_total"]) < losses0
        assert int(state["step"]) == 6
        # EMA teacher trails the student
        p = jax.tree_util.tree_leaves(state["params"])[0]
        e = jax.tree_util.tree_leaves(state["ema_params"])[0]
        assert not np.array_equal(np.asarray(p), np.asarray(e))

    def test_lr_schedule(self):
        tcfg = T.TrainConfig(lr=1e-3, warmup_iters=10, warmup_ratio=0.5,
                             iters_per_epoch=100, lr_steps=(2, 4))
        assert float(T.lr_at(jnp.int32(5), tcfg)) == pytest.approx(5e-4)
        assert float(T.lr_at(jnp.int32(50), tcfg)) == pytest.approx(1e-3)
        assert float(T.lr_at(jnp.int32(250), tcfg)) == pytest.approx(1e-4)
        assert float(T.lr_at(jnp.int32(450), tcfg)) == pytest.approx(1e-5)
