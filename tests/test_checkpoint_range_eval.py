"""Epoch-range checkpoint evaluation with polling (reference
``Pedestron/tools/test_city_person.py:250-290``): the detection eval CLI
waits for each ``epoch_N.npz`` to appear (training may still be running),
requires the NEXT epoch's file before reading one (writer-moved-on guard),
and evaluates every epoch of the range.
"""

import json
import os
import threading
import time

import jax
import numpy as np

from blockcopy_tpu.models.csp import CSPConfig, init_csp
from blockcopy_tpu.tasks.detection.eval import main
from blockcopy_tpu.utils.checkpoint import save_params

TINY_CFG = """
model = dict(
    type="CSPBlockCopy",
    blockcopy_settings=dict(
        block_policy="rl_objectdetection",
        block_num_classes=1,
        block_target=0.5,
        block_size=128,
    ),
    backbone=dict(type="ResNet", stage_blocks=(1, 1, 1, 1),
                  strides=(1, 2, 2, 1), dilations=(1, 1, 1, 2),
                  out_indices=(1, 2, 3)),
    bbox_head=dict(num_classes=2, stacked_convs=1),
)
test_cfg = dict(nms_pre=100, max_per_img=20)
"""


def test_epoch_range_eval_polls_and_evaluates(tmp_path):
    cfg_path = tmp_path / "tiny_csp.py"
    cfg_path.write_text(TINY_CFG)
    run_dir = tmp_path / "run"
    run_dir.mkdir()

    cfg = CSPConfig(stage_blocks=(1, 1, 1, 1), nms_pre=100, max_per_img=20)
    params = init_csp(jax.random.PRNGKey(0), cfg)
    save_params(str(run_dir / "epoch_0.npz"), params)

    # epoch_1 appears only after a delay: epoch 0's eval must first block in
    # the writer-moved-on poll, then proceed once the file exists
    def write_later():
        time.sleep(3)
        save_params(str(run_dir / "epoch_1.npz"), params)

    t = threading.Thread(target=write_later)
    t.start()
    out = str(tmp_path / "dets.json")
    try:
        summaries = main([
            "--config", str(cfg_path), "--checkpoint", str(run_dir),
            "--checkpoint-start", "0", "--checkpoint-end", "2",
            "--poll-seconds", "0.5", "--synthetic", "--res", "256",
            "--clip-length", "2", "--num-clips-warmup", "1",
            "--num-clips-eval", "1", "--workers", "1", "--out", out,
        ])
    finally:
        t.join()

    assert [s["epoch"] for s in summaries] == [0, 1]
    for s in summaries:
        assert s["result"]["fps"] > 0
        assert np.isfinite(s["result"]["gmacs_per_image"])
    # per-epoch detection dumps, not one overwritten file
    for ep in (0, 1):
        path = str(tmp_path / f"dets_epoch{ep}.json")
        assert os.path.isfile(path), path
        json.load(open(path))
