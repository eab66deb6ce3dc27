"""CSP detector, NMS, and detection information-gain tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.core.argparser import default_settings
from blockcopy_tpu.models.csp import (
    CSPBlockCopy,
    CSPConfig,
    csp_apply,
    csp_decode,
    dets_to_bbox_results,
    init_csp,
)
from blockcopy_tpu.core.blocked import ExecCtx
from blockcopy_tpu.ops.nms import box_iou_matrix, multiclass_nms_fixed, nms_mask

H, W, BS = 256, 512, 128
CFG = CSPConfig(nms_pre=200, max_per_img=20)


@pytest.fixture(scope="module")
def params():
    return init_csp(jax.random.PRNGKey(0), CFG)


class TestNMS:
    def test_iou_matrix(self):
        boxes = jnp.array([[0, 0, 9, 9], [0, 0, 9, 9], [20, 20, 29, 29]],
                          jnp.float32)
        iou = np.asarray(box_iou_matrix(boxes))
        assert iou[0, 1] == pytest.approx(1.0)
        assert iou[0, 2] == 0.0

    def test_greedy_suppression(self):
        boxes = jnp.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        keep = np.asarray(nms_mask(boxes, scores, iou_thr=0.5))
        assert list(keep) == [True, False, True]

    def test_padding_rows_never_kept(self):
        boxes = jnp.zeros((4, 4), jnp.float32)
        scores = jnp.array([0.9, 0.0, 0.0, 0.0])
        valid = jnp.array([True, False, False, False])
        keep = np.asarray(nms_mask(boxes, scores, 0.5, valid))
        assert list(keep) == [True, False, False, False]

    def test_multiclass_fixed_output(self):
        boxes = jnp.array(
            [[0, 0, 10, 10], [2, 2, 12, 12], [100, 100, 120, 130]],
            jnp.float32,
        )
        scores = jnp.array([[0.9], [0.85], [0.6]])
        dets, labels, valid = multiclass_nms_fixed(boxes, scores, 0.1, 0.5, 5)
        assert dets.shape == (5, 5) and labels.shape == (5,)
        v = np.asarray(valid)
        assert v.sum() == 2  # box 1 suppressed by box 0
        kept_scores = np.asarray(dets)[v, 4]
        np.testing.assert_allclose(sorted(kept_scores, reverse=True),
                                   [0.9, 0.6], rtol=1e-6)

    def test_selection_loop_matches_sequential_sweep(self):
        """The argmax-selection NMS (r4, TPU-shaped: max_keep iterations)
        must match the classic score-sorted sequential sweep box for box —
        including with a max_keep budget, where it must return a prefix of
        the sweep's kept sequence."""
        rs = np.random.RandomState(7)
        for trial in range(5):
            n = 120
            xy = rs.rand(n, 2) * 80
            wh = rs.rand(n, 2) * 40 + 4
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            scores = rs.rand(n).astype(np.float32)
            valid = rs.rand(n) > 0.2

            # reference semantics: numpy sequential greedy sweep
            order = np.argsort(-np.where(valid, scores, -np.inf),
                               kind="stable")
            iou = np.asarray(box_iou_matrix(jnp.asarray(boxes)))
            kept_seq = []
            suppressed = np.zeros(n, bool)
            for i in order:
                if not valid[i] or suppressed[i]:
                    continue
                kept_seq.append(i)
                suppressed |= iou[i] > 0.5
            keep_ref = np.zeros(n, bool)
            keep_ref[kept_seq] = True

            keep = np.asarray(nms_mask(jnp.asarray(boxes),
                                       jnp.asarray(scores), 0.5,
                                       jnp.asarray(valid)))
            np.testing.assert_array_equal(keep, keep_ref)

            k = 6
            keep_k = np.asarray(nms_mask(jnp.asarray(boxes),
                                         jnp.asarray(scores), 0.5,
                                         jnp.asarray(valid), max_keep=k))
            keep_prefix = np.zeros(n, bool)
            keep_prefix[kept_seq[:k]] = True
            np.testing.assert_array_equal(keep_k, keep_prefix)

    def test_fixpoint_matches_loop(self):
        """NMS_IMPL='fixpoint' (matvec fixpoint iteration) == the selection
        loop, on random sets, a budget cut, and an adversarial deep
        suppression chain (each box suppresses only the next, so the
        fixpoint needs the full chain depth to converge)."""
        from blockcopy_tpu.ops import nms as nmsmod

        rs = np.random.RandomState(11)
        cases = []
        for _ in range(4):
            n = 150
            xy = rs.rand(n, 2) * 80
            wh = rs.rand(n, 2) * 40 + 4
            boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
            scores = rs.rand(n).astype(np.float32)
            valid = rs.rand(n) > 0.2
            cases.append((boxes, scores, valid))
        # deep chain: box i at x=6i, width 10 -> overlaps only neighbors;
        # descending scores => greedy keeps every other box (depth ~n/2)
        n = 64
        x = (np.arange(n) * 6.0).astype(np.float32)
        boxes = np.stack([x, np.zeros(n, np.float32),
                          x + 12, np.full(n, 10, np.float32)], 1)
        scores = np.linspace(1.0, 0.5, n).astype(np.float32)
        cases.append((boxes, scores, np.ones(n, bool)))
        # score ties: pivot order must break to the lower index in both
        boxes_t, scores_t, valid_t = cases[0]
        scores_t = np.round(scores_t, 1)
        cases.append((boxes_t, scores_t, valid_t))

        old = nmsmod.NMS_IMPL
        try:
            for boxes, scores, valid in cases:
                for k in (None, 7):
                    got = {}
                    for impl in ("loop", "fixpoint"):
                        nmsmod.NMS_IMPL = impl
                        got[impl] = np.asarray(nms_mask(
                            jnp.asarray(boxes), jnp.asarray(scores), 0.35,
                            jnp.asarray(valid), max_keep=k))
                    np.testing.assert_array_equal(got["loop"],
                                                  got["fixpoint"])
        finally:
            nmsmod.NMS_IMPL = old

    def test_soft_nms(self):
        from blockcopy_tpu.ops.nms import soft_nms_numpy
        dets = np.array([[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8],
                         [50, 50, 60, 60, 0.7]], np.float32)
        out, inds = soft_nms_numpy(dets, iou_thr=0.3, method="linear")
        assert len(out) >= 2  # overlapping box decayed, not removed


class TestCSPForward:
    def test_dense_shapes(self, params):
        x = jnp.asarray(np.random.RandomState(0).randn(1, H, W, 3),
                        jnp.float32)
        cls_s, bbox_p, off_p = csp_apply(params, x, ExecCtx.dense(), CFG)
        assert cls_s.shape == (1, H // 4, W // 4, 1)
        assert bbox_p.shape == (1, H // 4, W // 4, 1)
        assert off_p.shape == (1, H // 4, W // 4, 2)

    def test_blocked_all_close_to_dense(self, params):
        from blockcopy_tpu.core import grid as gridlib
        from blockcopy_tpu.core.blocked import split_dense

        x = jnp.asarray(np.random.RandomState(1).randn(1, H, W, 3),
                        jnp.float32)
        dense_out = csp_apply(params, x, ExecCtx.dense(), CFG)
        n, gh, gw = 1, H // BS, W // BS
        total = n * gh * gw
        idx = gridlib.exec_indices(jnp.ones((n, gh, gw), bool), total)
        ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
        pack = split_dense(x, idx, n, gh, gw)
        blocked_out = csp_apply(params, pack, ctx, CFG)
        # The neck's k4s2p1 ConvTranspose runs per block (reference semantics
        # too), leaving ~1px seams at /8-block borders that the head convs
        # spread by ±1: interiors must match tightly, global fraction loosely.
        obs = BS // 4  # block size at stride 4
        m = 6          # seam margin in stride-4 pixels
        # (GN statistics couple the seam error weakly into all pixels — also
        # true of the reference, whose GN spans all combined blocks.)
        for d, b in zip(dense_out, blocked_out):
            d, b = np.asarray(d), np.asarray(b)
            frac_close = np.mean(np.isclose(d, b, rtol=5e-2, atol=5e-2))
            assert frac_close > 0.8, frac_close  # seams: 3 col + 1 row, ~4px wide after head convs
            dd = d.reshape(1, d.shape[1] // obs, obs, d.shape[2] // obs, obs, -1)
            bb = b.reshape(1, b.shape[1] // obs, obs, b.shape[2] // obs, obs, -1)
            np.testing.assert_allclose(
                dd[:, :, m:-m, :, m:-m], bb[:, :, m:-m, :, m:-m],
                rtol=5e-2, atol=5e-2,
            )

    def test_decode_finds_planted_peak(self, params):
        cls = jnp.full((1, 64, 128, 1), -8.0)
        cls = cls.at[0, 32, 64, 0].set(6.0)  # strong center
        bbox = jnp.full((1, 64, 128, 1), jnp.log(10.0))  # height 40 px
        off = jnp.zeros((1, 64, 128, 2))
        dets, labels, valid = csp_decode(cls, bbox, off, (H, W), CFG)
        v = np.asarray(valid)
        assert v.sum() >= 1
        top = np.asarray(dets)[0]
        # center at (x, y) = (64*4+2, 32*4+2); height 40, width 16.4
        assert abs((top[1] + top[3]) / 2 - (32 * 4 + 2)) < 1.0
        assert abs((top[3] - top[1]) - 40.0) < 1.0
        assert abs((top[2] - top[0]) - 0.41 * 40.0) < 1.0

    def _random_maps(self, seed=3):
        rs = np.random.RandomState(seed)
        cls = jnp.asarray(rs.randn(1, 64, 128, 1).astype(np.float32) * 2 - 2)
        bbox = jnp.asarray(rs.randn(1, 64, 128, 1).astype(np.float32) * 0.3
                           + np.log(12.0))
        off = jnp.asarray(rs.randn(1, 64, 128, 2).astype(np.float32) * 0.2)
        return cls, bbox, off

    def test_decode_lean_points_exact(self):
        """DECODE_LEAN_POINTS (x=i%W, y=i//W from the top-k indices) is
        bit-exact vs gathering the materialized full points array."""
        import blockcopy_tpu.models.csp as cspmod

        cls, bbox, off = self._random_maps()
        old = cspmod.DECODE_LEAN_POINTS
        try:
            outs = {}
            for flag in (False, True):
                cspmod.DECODE_LEAN_POINTS = flag
                outs[flag] = csp_decode(cls, bbox, off, (H, W), CFG)
            for a, b in zip(outs[False], outs[True]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        finally:
            cspmod.DECODE_LEAN_POINTS = old

    def test_decode_topk_approx_matches_sort(self):
        """TOPK_IMPL='approx' (approx_max_k at recall 1.0) == 'sort'
        (lax.top_k) through the whole decode, on score maps without exact
        ties (ties at the k-th score are the documented caveat where the
        selected index subsets may legitimately differ)."""
        import blockcopy_tpu.models.csp as cspmod

        cls, bbox, off = self._random_maps(seed=7)
        old = cspmod.TOPK_IMPL
        try:
            outs = {}
            for impl in ("sort", "approx"):
                cspmod.TOPK_IMPL = impl
                outs[impl] = csp_decode(cls, bbox, off, (H, W), CFG)
            for a, b in zip(outs["sort"], outs["approx"]):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0, atol=0)
        finally:
            cspmod.TOPK_IMPL = old

    def test_decode_topk_ties_below_thr_harmless(self):
        """The documented TOPK='approx' tie caveat is only about WHICH of
        several exactly-tied candidates at the nms_pre boundary get
        selected.  When those ties sit below score_thr (the common case: a
        constant background sea), the tied candidates are invalid in the
        NMS either way, so the VALID rows of the final output must be
        identical between the two lowerings."""
        import blockcopy_tpu.models.csp as cspmod

        # constant background logit => 8191 exactly-tied candidates below
        # score_thr=0.1; one strong peak above it
        cls = jnp.full((1, 64, 128, 1), -4.0)   # sigmoid ~0.018 < 0.1
        cls = cls.at[0, 20, 40, 0].set(5.0)
        bbox = jnp.full((1, 64, 128, 1), jnp.log(12.0))
        off = jnp.zeros((1, 64, 128, 2))
        old = cspmod.TOPK_IMPL
        try:
            outs = {}
            for impl in ("sort", "approx"):
                cspmod.TOPK_IMPL = impl
                outs[impl] = [np.asarray(a) for a in
                              csp_decode(cls, bbox, off, (H, W), CFG)]
        finally:
            cspmod.TOPK_IMPL = old
        d_s, l_s, v_s = outs["sort"]
        d_a, l_a, v_a = outs["approx"]
        np.testing.assert_array_equal(v_s, v_a)
        np.testing.assert_array_equal(d_s[v_s], d_a[v_a])
        np.testing.assert_array_equal(l_s[v_s], l_a[v_a])
        assert v_s.sum() >= 1


class TestDetectionIG:
    def test_identical_boxes_zero_gain(self):
        from blockcopy_tpu.tasks.detection.information_gain import (
            build_instance_mask_iou_gain,
        )
        boxes = [[np.array([[10, 10, 50, 90, 0.9]], np.float32)]]
        ig = build_instance_mask_iou_gain(boxes, boxes, (1, 128, 128, 1))
        assert ig.max() == pytest.approx(0.0)

    def test_disappeared_box_full_gain(self):
        from blockcopy_tpu.tasks.detection.information_gain import (
            build_instance_mask_iou_gain,
        )
        prev = [[np.array([[10, 10, 50, 90, 0.8]], np.float32)]]
        cur = [[np.zeros((0, 5), np.float32)]]
        ig = build_instance_mask_iou_gain(cur, prev, (1, 128, 128, 1))
        assert ig[0, 40, 30, 0] == pytest.approx(0.8)

    def test_output_repr_mask(self):
        from blockcopy_tpu.tasks.detection.information_gain import (
            DetectionInformationGain,
        )
        ig = DetectionInformationGain(num_classes=1)
        meta = {
            "outputs": [[np.array([[0, 0, 10, 10, 0.5]], np.float32)]],
            "inputs": jnp.zeros((1, 64, 64, 3)),
        }
        mask = np.asarray(ig.get_output_repr(meta))
        assert mask.shape == (1, 64, 64, 1)
        assert mask[0, 5, 5, 0] == pytest.approx(0.5)
        assert mask[0, 30, 30, 0] == 0.0


class TestCSPBlockCopyEngine:
    def test_clip_with_rl_policy(self, params):
        settings = default_settings(
            block_policy="rl_objectdetection", block_num_classes=1,
            block_size=BS, block_train_interval=2,
            block_quantize_number_exec=0.5, block_target=0.3,
        )
        model = CSPBlockCopy(params, CFG, settings)
        model.reset_temporal()
        rs = np.random.RandomState(0)
        base = rs.randn(1, H, W, 3).astype(np.float32)
        for t in range(4):
            f = base.copy()
            f[:, 20 * t: 20 * t + 60, 20 * t: 20 * t + 60] += 2.0
            out = model(jnp.asarray(f))
        assert isinstance(out, list) and len(out) == CFG.num_classes - 1
        assert out[0].ndim == 2 and out[0].shape[1] == 5
        assert model.flops.average_gmacs() > 0
        assert model.policy.running_cost is not None


class TestSoftNMSPath:
    def test_soft_nms_rescore_fixed_shapes(self):
        import jax.numpy as jnp
        from blockcopy_tpu.models.csp import soft_nms_rescore
        cfg = CSPConfig(nms_type="soft_nms", max_per_img=6)
        dets = jnp.array(
            [[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8],
             [50, 50, 60, 60, 0.7], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0],
             [0, 0, 0, 0, 0]], jnp.float32)
        labels = jnp.zeros((6,), jnp.int32)
        valid = jnp.array([True, True, True, False, False, False])
        d2, l2, v2 = soft_nms_rescore(dets, labels, valid, cfg)
        assert d2.shape == (6, 5) and v2.sum() >= 2
        assert d2[0, 4] == pytest.approx(0.9)      # top box untouched
        kept_scores = d2[v2][:, 4]
        assert (kept_scores[:-1] >= kept_scores[1:]).all()

    def test_builder_reads_nms_type(self, tmp_path):
        from blockcopy_tpu.models.builder import csp_config_from_dict
        cfg = {
            "model": {"type": "CSPBlockCopy"},
            "test_cfg": {"nms": {"type": "soft_nms", "iou_thr": 0.4}},
        }
        c = csp_config_from_dict(cfg)
        assert c.nms_type == "soft_nms" and c.nms_iou == 0.4
