"""Detection speed mode: jittable information-gain parity vs the host
implementation, and DetectionStepper vs ladder-engine agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.tasks.detection.information_gain import (
    build_instance_mask,
    build_instance_mask_iou_gain,
    instance_mask_fixed,
    iou_gain_fixed,
    paint_boxes_max,
)


def random_dets(k_valid, k_total, seed, h=128, w=256):
    rs = np.random.RandomState(seed)
    dets = np.zeros((k_total, 5), np.float32)
    x1 = rs.uniform(0, w - 20, k_valid)
    y1 = rs.uniform(0, h - 20, k_valid)
    bw = rs.uniform(4, 60, k_valid)
    bh = rs.uniform(4, 60, k_valid)
    dets[:k_valid, 0] = x1
    dets[:k_valid, 1] = y1
    dets[:k_valid, 2] = np.minimum(x1 + bw, w - 1)
    dets[:k_valid, 3] = np.minimum(y1 + bh, h - 1)
    dets[:k_valid, 4] = rs.uniform(0.1, 1.0, k_valid)
    labels = np.zeros((k_total,), np.int32)
    valid = np.zeros((k_total,), bool)
    valid[:k_valid] = True
    return dets, labels, valid


def to_bbox_results(dets, labels, valid, num_fg=1):
    out = []
    for c in range(num_fg):
        sel = valid & (labels == c)
        out.append(dets[sel])
    return [out]


class TestPaint:
    def test_paint_matches_numpy(self):
        h, w = 64, 96
        rs = np.random.RandomState(0)
        boxes = np.stack([
            rs.randint(0, w // 2, 17), rs.randint(0, h // 2, 17),
            rs.randint(w // 2, w, 17), rs.randint(h // 2, h, 17),
        ], -1).astype(np.int32)
        weights = rs.uniform(0, 1, 17).astype(np.float32)
        ours = np.asarray(paint_boxes_max(jnp.asarray(boxes),
                                          jnp.asarray(weights), h, w))
        ref = np.zeros((h, w), np.float32)
        for (x1, y1, x2, y2), s in zip(boxes, weights):
            ref[y1:y2, x1:x2] = np.maximum(ref[y1:y2, x1:x2], s)
        np.testing.assert_allclose(ours, ref)


class TestIoUGainParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("kcur,kprev", [(5, 7), (0, 4), (6, 0)])
    def test_matches_host_implementation(self, seed, kcur, kprev):
        h, w = 128, 256
        k = 16
        dets, labels, valid = random_dets(kcur, k, seed, h, w)
        dets_p, labels_p, valid_p = random_dets(kprev, k, seed + 100, h, w)

        ours = np.asarray(iou_gain_fixed(
            jnp.asarray(dets), jnp.asarray(labels), jnp.asarray(valid),
            jnp.asarray(dets_p), jnp.asarray(labels_p), jnp.asarray(valid_p),
            (h, w), 2))
        ref = build_instance_mask_iou_gain(
            to_bbox_results(dets, labels, valid),
            to_bbox_results(dets_p, labels_p, valid_p),
            (1, h, w, 1), 2)
        # ref is nearest-upsampled to full res; subsample it back
        ref_sub = ref[:, ::2, ::2, :]
        np.testing.assert_allclose(ours, ref_sub, rtol=1e-5, atol=1e-6)

    def test_instance_mask_matches_host(self):
        h, w = 128, 256
        dets, labels, valid = random_dets(6, 16, 3, h, w)
        ours = np.asarray(instance_mask_fixed(
            jnp.asarray(dets), jnp.asarray(labels), jnp.asarray(valid),
            (h, w), 1, 1.0))
        ref = build_instance_mask(to_bbox_results(dets, labels, valid),
                                  (1, h, w, 1))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestHeadBlockedFinal:
    """The r4 TPU lowering of the head tail (final 3x3 prediction convs run
    blocked, halo from strip canvases, outputs through per-map canvases —
    ``models/csp.py:csp_head``) vs the reference-exact dense tail."""

    def _run_two_frames(self, flag, monkeypatch):
        from blockcopy_tpu.core import grid as gridlib
        from blockcopy_tpu.core.blocked import ExecCtx, split_dense
        from blockcopy_tpu.models import csp as csp_mod
        from blockcopy_tpu.models.csp import CSPConfig, csp_apply, init_csp

        monkeypatch.setattr(csp_mod, "HEAD_BLOCKED_FINAL", flag)
        cfg = CSPConfig(stage_blocks=(1, 1, 1, 1))
        params = init_csp(jax.random.PRNGKey(0), cfg)
        n, gh, gw = 1, 2, 2
        rs = np.random.RandomState(5)
        f0 = jnp.asarray(rs.randn(1, 256, 256, 3).astype(np.float32))
        f1 = f0 + jnp.asarray(rs.randn(1, 256, 256, 3).astype(np.float32))

        idx0 = jnp.arange(4, dtype=jnp.int32)
        ctx0 = ExecCtx.blocked(idx0, n, gh, gw, {}, building=True)
        out0 = csp_apply(params, split_dense(f0, idx0, n, gh, gw), ctx0, cfg)

        idx1 = gridlib.exec_indices(
            jnp.array([[[True, False], [False, True]]]), 2)
        ctx1 = ExecCtx.blocked(idx1, n, gh, gw, ctx0.canvases)
        out1 = csp_apply(params, split_dense(f1, idx1, n, gh, gw), ctx1, cfg)
        return [np.asarray(o) for o in out0], [np.asarray(o) for o in out1]

    def test_all_exec_exact_partial_bounded(self, monkeypatch):
        a0, a1 = self._run_two_frames(False, monkeypatch)
        b0, b1 = self._run_two_frames(True, monkeypatch)
        # frame 1 (all blocks executed): the blocked final conv reads the
        # exact same neighborhoods the dense conv reads -> equal maps
        for x, y in zip(a0, b0):
            np.testing.assert_allclose(x, y, rtol=1e-4, atol=5e-5)
        # frame 2 (blocks 0 and 3 executed): executed blocks exact; skipped
        # blocks equal except their 1-px borders (dense recomputes them with
        # fresh neighbor halo, blocked keeps the previous frame's values)
        o = 32  # block size at stride 4
        for x, y in zip(a1, b1):
            for (by, bx) in [(0, 0), (1, 1)]:   # executed
                np.testing.assert_allclose(
                    x[:, by * o:(by + 1) * o, bx * o:(bx + 1) * o],
                    y[:, by * o:(by + 1) * o, bx * o:(bx + 1) * o],
                    rtol=1e-4, atol=5e-5)
            for (by, bx) in [(0, 1), (1, 0)]:   # skipped: interior equal
                xi = x[:, by * o + 1:(by + 1) * o - 1,
                       bx * o + 1:(bx + 1) * o - 1]
                yi = y[:, by * o + 1:(by + 1) * o - 1,
                       bx * o + 1:(bx + 1) * o - 1]
                np.testing.assert_allclose(xi, yi, rtol=1e-4, atol=5e-5)


class TestHeadFusedBranchConv:
    """HEAD_FUSED_BRANCH_CONV: the three branch ConvModules' first convs run
    as one conv with kernels concatenated on the output-channel axis
    (``models/csp.py:csp_head``).  Each output channel is the identical dot
    product, and the single shared strip canvas holds the same values the
    three per-branch canvases held — so outputs must match the unfused path
    on every frame, executed and skipped blocks alike."""

    def _run_two_frames(self, flag, monkeypatch):
        from blockcopy_tpu.core import grid as gridlib
        from blockcopy_tpu.core.blocked import ExecCtx, split_dense
        from blockcopy_tpu.models import csp as csp_mod
        from blockcopy_tpu.models.csp import CSPConfig, csp_apply, init_csp

        monkeypatch.setattr(csp_mod, "HEAD_FUSED_BRANCH_CONV", flag)
        cfg = CSPConfig(stage_blocks=(1, 1, 1, 1))
        params = init_csp(jax.random.PRNGKey(0), cfg)
        n, gh, gw = 1, 2, 2
        rs = np.random.RandomState(7)
        f0 = jnp.asarray(rs.randn(1, 256, 256, 3).astype(np.float32))
        f1 = f0 + jnp.asarray(rs.randn(1, 256, 256, 3).astype(np.float32))

        idx0 = jnp.arange(4, dtype=jnp.int32)
        ctx0 = ExecCtx.blocked(idx0, n, gh, gw, {}, building=True)
        out0 = csp_apply(params, split_dense(f0, idx0, n, gh, gw), ctx0, cfg)

        idx1 = gridlib.exec_indices(
            jnp.array([[[True, False], [False, True]]]), 2)
        ctx1 = ExecCtx.blocked(idx1, n, gh, gw, ctx0.canvases)
        out1 = csp_apply(params, split_dense(f1, idx1, n, gh, gw), ctx1, cfg)
        return [np.asarray(o) for o in out0], [np.asarray(o) for o in out1]

    def test_exact_equivalence(self, monkeypatch):
        a0, a1 = self._run_two_frames(False, monkeypatch)
        b0, b1 = self._run_two_frames(True, monkeypatch)
        for x, y in zip(a0 + a1, b0 + b1):
            np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-6)


class TestDetectionStepper:
    def _build(self, policy_arch="ref"):
        from blockcopy_tpu.core.stepper import StepperConfig
        from blockcopy_tpu.models.csp import CSPConfig, init_csp
        from blockcopy_tpu.tasks.detection.stepper import DetectionStepper

        csp_cfg = CSPConfig(stage_blocks=(1, 1, 1, 1), nms_pre=64,
                            max_per_img=8)
        params = init_csp(jax.random.PRNGKey(0), csp_cfg)
        scfg = StepperConfig(block_size=128, train_interval=2, num_classes=1,
                             policy_arch=policy_arch)
        frame_shape = (1, 256, 256, 3)
        stepper = DetectionStepper(csp_cfg, scfg, frame_shape, capacity=2)
        return stepper, params, csp_cfg, frame_shape

    def test_fast_policy_arch_steps_and_trains(self):
        """The detection stepper accepts the fast policy arch (the
        bench_detection default) and its REINFORCE update trains."""
        stepper, params, csp_cfg, frame_shape = self._build("fast")
        state = stepper.init_state(params, jax.random.PRNGKey(1))
        assert "stem" in state["policy"]["params"]
        rs = np.random.RandomState(3)
        f = jnp.asarray(rs.randn(*frame_shape).astype(np.float32))
        state = jax.jit(stepper.first_step)(params, state, f)
        step = jax.jit(stepper.step)
        p0 = np.asarray(state["policy"]["params"]["stem"]["w"])
        state = step(params, state, f + 0.2)  # frame 2: trains (interval 2)
        assert np.isfinite(np.asarray(state["dets"])).all()
        p2 = np.asarray(state["policy"]["params"]["stem"]["w"])
        assert not np.array_equal(p0, p2)

    def test_stepper_runs_and_trains(self):
        stepper, params, csp_cfg, frame_shape = self._build()
        state = stepper.init_state(params, jax.random.PRNGKey(1))
        rs = np.random.RandomState(0)
        f = jnp.asarray(rs.randn(*frame_shape).astype(np.float32))
        state = jax.jit(stepper.first_step)(params, state, f)
        p0 = state["policy"]["params"]["conv1"]["w"]
        step = jax.jit(stepper.step)
        for t in range(4):
            f2 = jnp.asarray(rs.randn(*frame_shape).astype(np.float32))
            state = step(params, state, f2)
        assert np.asarray(state["dets"]).shape == (8, 5)
        assert bool(jnp.all(jnp.isfinite(state["dets"])))
        assert int(state["frame_idx"]) == 5
        # REINFORCE must have updated the policy at least once
        moved = float(jnp.abs(
            state["policy"]["params"]["conv1"]["w"] - p0).max())
        assert moved > 0, "policy never trained"
        assert float(state["policy"]["running_cost"]) > 0

    def test_detection_clip_parallel_mesh(self):
        """Detection stepper shards over the clip mesh like semseg (the
        task-generic state pytree carries dets/labels/valid per device)."""
        import numpy as np

        from blockcopy_tpu.parallel import clip_parallel

        stepper, params, csp_cfg, frame_shape = self._build()
        n_dev = 2
        mesh = clip_parallel.make_mesh(n_dev)
        state = clip_parallel.init_parallel_state(
            stepper, params, jax.random.PRNGKey(1), n_dev)
        first, step = clip_parallel.build_parallel_steps(stepper, mesh)
        rs = np.random.RandomState(0)
        f = jnp.asarray(rs.randn(n_dev, *frame_shape).astype(np.float32))
        state = first(params, state, f)
        state = step(params, state, f + 0.1)
        dets = np.asarray(state["dets"])
        assert dets.shape == (n_dev, 8, 5)
        assert np.isfinite(dets).all()

    def test_soft_nms_reachable_in_speed_mode(self):
        """``nms_type='soft_nms'`` must apply in speed mode too: on the
        all-exec first frame the _StepperDetector fetch and the ladder
        engine (which rescored since round 2) yield identical results
        (regression: the stepper silently hard-NMSed soft-NMS configs)."""
        from blockcopy_tpu.core.argparser import default_settings
        from blockcopy_tpu.models.csp import CSPBlockCopy, CSPConfig, init_csp
        from blockcopy_tpu.tasks.detection.eval import _StepperDetector

        csp_cfg = CSPConfig(stage_blocks=(1, 1, 1, 1), nms_pre=64,
                            max_per_img=8, nms_type="soft_nms")
        params = init_csp(jax.random.PRNGKey(0), csp_cfg)
        frame_shape = (1, 256, 256, 3)
        settings = default_settings(block_policy="rl_objectdetection",
                                    block_size=128, block_num_classes=1,
                                    block_target=0.5)
        det = _StepperDetector(params, csp_cfg, settings, frame_shape,
                               jnp.float32)
        rs = np.random.RandomState(7)
        f = jnp.asarray(rs.randn(*frame_shape).astype(np.float32))
        ours = det.simple_test(f)

        engine = CSPBlockCopy(params, csp_cfg,
                              default_settings(block_policy="all",
                                               block_size=128,
                                               block_num_classes=1))
        ref = engine.simple_test(f)
        for a, b in zip(ours, ref):
            a = a[np.argsort(-a[:, 4])]
            b = b[np.argsort(-b[:, 4])]
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_first_step_matches_ladder_engine(self):
        """All-exec frame 1: the fused stepper's decoded boxes must equal the
        ladder engine's (same model code, same decode)."""
        from blockcopy_tpu.core.argparser import default_settings
        from blockcopy_tpu.models.csp import (
            CSPBlockCopy, dets_to_bbox_results)

        stepper, params, csp_cfg, frame_shape = self._build()
        state = stepper.init_state(params, jax.random.PRNGKey(1))
        rs = np.random.RandomState(7)
        f = jnp.asarray(rs.randn(*frame_shape).astype(np.float32))
        state = jax.jit(stepper.first_step)(params, state, f)
        ours = dets_to_bbox_results(state["dets"], state["labels"],
                                    state["valid"], csp_cfg.num_classes)[0]

        engine = CSPBlockCopy(params, csp_cfg,
                              default_settings(block_policy="all",
                                               block_size=128,
                                               block_num_classes=1))
        ref = engine.simple_test(f)
        for a, b in zip(ours, ref):
            a = a[np.argsort(-a[:, 4])]
            b = b[np.argsort(-b[:, 4])]
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
