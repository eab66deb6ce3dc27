"""CityPersons MR protocol parity: our clean-room evaluator
(``tasks/detection/eval_mr.py``) vs the reference's actual evaluation code
(``Pedestron/tools/cityPerson/coco.py`` + ``eval_MR_multisetup.py``,
numpy-only, loaded from the reference tree) on synthetic GT + detections
spanning all four setups (height/visibility ranges, ignore regions)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/Pedestron/tools/cityPerson"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")


def _load(fullname, path):
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_eval():
    import matplotlib
    matplotlib.use("Agg")  # the reference module imports pyplot at top level
    # the reference predates numpy 1.24: restore the removed scalar aliases
    for name, typ in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, name):
            setattr(np, name, typ)
    coco_mod = _load("ref_cityperson_coco", os.path.join(REF, "coco.py"))
    eval_mod = _load("ref_cityperson_eval",
                     os.path.join(REF, "eval_MR_multisetup.py"))
    return coco_mod, eval_mod


def synth_dataset(seed=0, n_imgs=8, w=2048, h=1024):
    """GT with heights/visibilities covering every setup + ignore regions,
    detections = jittered GT + spurious boxes + misses."""
    rs = np.random.RandomState(seed)
    images, anns, dets = [], [], []
    aid = 1
    for i in range(n_imgs):
        img_id = i + 1
        images.append({"id": img_id, "file_name": f"img_{i:04d}.png",
                       "width": w, "height": h})
        for _ in range(rs.randint(2, 7)):
            bh = float(rs.choice([40, 60, 90, 140, 260]))
            bw = bh * 0.41
            x = float(rs.uniform(0, w - bw))
            y = float(rs.uniform(0, h - bh))
            vis = float(rs.choice([0.95, 0.8, 0.5, 0.3]))
            ignore = int(rs.rand() < 0.15)
            anns.append({"id": aid, "image_id": img_id, "category_id": 1,
                         "bbox": [x, y, bw, bh], "height": bh,
                         "vis_ratio": vis, "ignore": ignore,
                         "iscrowd": ignore, "area": bw * bh})
            aid += 1
            if rs.rand() < 0.8:  # matched detection w/ jitter
                dets.append({"image_id": img_id, "category_id": 1,
                             "bbox": [x + rs.uniform(-6, 6),
                                      y + rs.uniform(-6, 6),
                                      bw * rs.uniform(0.85, 1.15),
                                      bh * rs.uniform(0.85, 1.15)],
                             "score": float(rs.uniform(0.2, 1.0))})
        for _ in range(rs.randint(0, 4)):  # false positives
            bh = float(rs.uniform(40, 200))
            dets.append({"image_id": img_id, "category_id": 1,
                         "bbox": [float(rs.uniform(0, w - 50)),
                                  float(rs.uniform(0, h - bh)),
                                  bh * 0.41, bh],
                         "score": float(rs.uniform(0.05, 0.9))})
    gt = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "pedestrian"}]}
    return gt, dets


@pytest.mark.parametrize("seed", [0, 7])
def test_mr_matches_reference_evaluator(ref_eval, tmp_path, seed):
    coco_mod, eval_mod = ref_eval
    gt, dets = synth_dataset(seed)
    ann_file = str(tmp_path / f"gt{seed}.json")
    dt_file = str(tmp_path / f"dt{seed}.json")
    with open(ann_file, "w") as f:
        json.dump(gt, f)
    with open(dt_file, "w") as f:
        json.dump(dets, f)

    ref_mrs = []
    for id_setup in range(4):
        cocoGt = coco_mod.COCO(ann_file)
        cocoDt = cocoGt.loadRes(dt_file)
        E = eval_mod.COCOeval(cocoGt, cocoDt, "bbox")
        E.params.imgIds = sorted(cocoGt.getImgIds())
        E.evaluate(id_setup)
        E.accumulate()
        ref_mrs.append(E.summarize_nofile(id_setup))

    from blockcopy_tpu.tasks.detection.eval_mr import (
        CityPersonsMREvaluator, SETUP_LABELS)
    ours = CityPersonsMREvaluator(gt).evaluate(dets)
    for i, label in enumerate(SETUP_LABELS):
        ref_pct = float(ref_mrs[i]) * 100.0
        got = ours[label]
        if ref_pct < 0:       # setup empty for this synthetic draw
            continue
        assert abs(got - ref_pct) < 1e-6, (label, got, ref_pct)
