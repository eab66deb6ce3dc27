"""CityPersons MR evaluator, registry/config system, detection CLI."""

import json

import numpy as np
import pytest

from blockcopy_tpu.tasks.detection.eval_mr import (
    CityPersonsMREvaluator,
    bbox_results_to_coco,
)
from blockcopy_tpu.utils.registry import Registry, build_from_cfg, load_config


def make_gt(num_images=20, boxes_per_img=2):
    images, anns = [], []
    aid = 1
    rs = np.random.RandomState(0)
    for i in range(1, num_images + 1):
        images.append({"id": i, "file_name": f"img_{i:06d}.png",
                       "width": 2048, "height": 1024})
        for _ in range(boxes_per_img):
            h = int(rs.randint(60, 200))
            w = int(h * 0.41)
            x = int(rs.randint(0, 2048 - w))
            y = int(rs.randint(0, 1024 - h))
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "bbox": [x, y, w, h], "height": h,
                         "vis_ratio": 1.0, "ignore": 0, "iscrowd": 0,
                         "area": w * h})
            aid += 1
    return {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "pedestrian"}]}


class TestMREvaluator:
    def test_perfect_detections_zero_mr(self):
        gt = make_gt()
        ev = CityPersonsMREvaluator(gt)
        dets = [
            {"image_id": a["image_id"], "bbox": list(a["bbox"]),
             "score": 0.95, "category_id": 1}
            for a in gt["annotations"]
        ]
        mrs = ev.evaluate(dets)
        assert mrs["Reasonable"] == pytest.approx(0.0, abs=1e-6)
        assert mrs["All"] == pytest.approx(0.0, abs=1e-6)

    def test_no_detections_full_mr(self):
        gt = make_gt()
        ev = CityPersonsMREvaluator(gt)
        mrs = ev.evaluate([])
        assert mrs["Reasonable"] == pytest.approx(100.0)

    def test_half_missed(self):
        gt = make_gt(num_images=20, boxes_per_img=2)
        ev = CityPersonsMREvaluator(gt)
        dets = [
            {"image_id": a["image_id"], "bbox": list(a["bbox"]),
             "score": 0.9, "category_id": 1}
            for k, a in enumerate(gt["annotations"]) if k % 2 == 0
        ]
        mrs = ev.evaluate(dets)
        assert 30.0 < mrs["Reasonable"] < 70.0

    def test_ignored_regions_dont_count(self):
        gt = make_gt(num_images=4, boxes_per_img=1)
        for a in gt["annotations"]:
            a["ignore"] = 1
        gt["annotations"][0]["ignore"] = 0
        ev = CityPersonsMREvaluator(gt)
        a = gt["annotations"][0]
        dets = [{"image_id": a["image_id"], "bbox": list(a["bbox"]),
                 "score": 0.9, "category_id": 1}]
        mrs = ev.evaluate(dets)
        assert mrs["Reasonable"] == pytest.approx(0.0, abs=1e-6)

    def test_false_positives_raise_mr(self):
        gt = make_gt(num_images=10, boxes_per_img=1)
        ev = CityPersonsMREvaluator(gt)
        dets = []
        for a in gt["annotations"]:
            dets.append({"image_id": a["image_id"], "bbox": list(a["bbox"]),
                         "score": 0.5, "category_id": 1})
            # high-scoring false positive in every image
            dets.append({"image_id": a["image_id"],
                         "bbox": [5, 5, 40, 100], "score": 0.99,
                         "category_id": 1})
        mrs_fp = ev.evaluate(dets)
        mrs_clean = ev.evaluate([d for d in dets if d["score"] == 0.5])
        assert mrs_fp["Reasonable"] >= mrs_clean["Reasonable"]

    def test_bbox_results_to_coco(self):
        arr = np.array([[10.0, 20.0, 30.0, 60.0, 0.7]], np.float32)
        out = bbox_results_to_coco([arr], image_id=7)
        assert out[0]["bbox"] == [10.0, 20.0, 20.0, 40.0]
        assert out[0]["image_id"] == 7
        assert out[0]["height"] == 40.0


class TestRegistry:
    def test_register_and_build(self):
        reg = Registry("test")

        @reg.register_module
        class Foo:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        obj = build_from_cfg(dict(type="Foo", a=1), reg, dict(b=5))
        assert obj.a == 1 and obj.b == 5

    def test_unknown_type_raises(self):
        reg = Registry("test2")
        with pytest.raises(KeyError):
            build_from_cfg(dict(type="Nope"), reg)

    def test_load_config(self, tmp_path):
        cfg_file = tmp_path / "cfg.py"
        cfg_file.write_text(
            "model = dict(type='CSPBlockCopy',\n"
            "    blockcopy_settings=dict(block_target=0.3))\n"
            "test_cfg = dict(score_thr=0.1)\n"
        )
        cfg = load_config(str(cfg_file))
        assert cfg["model"]["blockcopy_settings"]["block_target"] == 0.3
        assert cfg["test_cfg"]["score_thr"] == 0.1


class TestDetectionCLI:
    def test_synthetic_end_to_end(self):
        from blockcopy_tpu.tasks.detection import eval as cli
        results = cli.main([
            "--synthetic", "--res", "256", "--clip-length", "3",
            "--num-clips-warmup", "1", "--num-clips-eval", "1",
            "--block-policy", "rl_objectdetection",
        ])
        assert "MR_Reasonable" in results
        assert results["gmacs_per_image"] > 0
        assert 0 < results["perc_exec"] <= 1.0

    def test_config_file_with_cli_override(self, tmp_path):
        """--config path end-to-end, with an explicit --block-* flag taking
        precedence over the config's blockcopy_settings (regression: CLI
        flags used to be silently discarded with --config)."""
        from blockcopy_tpu.tasks.detection import eval as cli
        cfg = tmp_path / "cfg.py"
        cfg.write_text(
            "model = dict(type='CSPBlockCopy',\n"
            "    backbone=dict(type='ResNet', depth=50,\n"
            "                  stage_blocks=(1, 1, 1, 1)),\n"
            "    blockcopy_settings=dict(block_target=0.9))\n"
            "test_cfg = dict(nms_pre=64, max_per_img=8)\n"
        )
        results = cli.main([
            "--config", str(cfg),
            "--synthetic", "--res", "256", "--clip-length", "3",
            "--num-clips-warmup", "1", "--num-clips-eval", "1",
            "--block-policy", "rl_objectdetection",
            # 0.5 IS the parser default — an explicitly typed flag must
            # still beat the config (SUPPRESS-reparse detection; the old
            # compare-to-defaults logic silently let the config win here)
            "--block-target", "0.5",
        ])
        assert "MR_Reasonable" in results
        assert results["gmacs_per_image"] > 0
        assert results["block_target"] == 0.5

    def test_explicitly_passed_detection(self):
        from blockcopy_tpu.tasks.detection.eval import _explicitly_passed
        ex = _explicitly_passed(["--synthetic", "--block-target", "0.5"])
        assert "block_target" in ex
        assert "synthetic" in ex
        assert "block_size" not in ex and "res" not in ex
