"""Detection training end-to-end: the train CLI on synthetic data must
reduce the loss, write student/teacher/resume checkpoints, and those must be
loadable by the eval-side detector builder."""

import os

import numpy as np

from blockcopy_tpu.tasks.detection.train_cli import main as train_main


def test_train_cli_end_to_end(tmp_path):
    out = str(tmp_path / "work")
    r = train_main([
        "--synthetic", "--epochs", "2", "--steps-per-epoch", "8",
        "--batch-size", "2", "--crop-height", "128", "--crop-width", "256",
        "--num-samples", "16", "--warmup-iters", "0", "--lr", "4e-4",
        "--workers", "2", "--out", out, "--log-interval", "4",
    ])
    assert r["step"] == 16
    # loss decreases over training (synthetic boxes are easy)
    assert r["final_losses"]["loss_total"] < r["first_losses"]["loss_total"], r

    for f in ("epoch_1.npz", "epoch_2.npz", "epoch_1_teacher.npz",
              "epoch_2_teacher.npz", "latest_state.npz"):
        assert os.path.isfile(os.path.join(out, f)), f

    # the eval-side builder must accept the trained checkpoints
    from blockcopy_tpu.models.builder import build_detector
    from blockcopy_tpu.utils.registry import load_config

    cfg = load_config("configs/csp/csp_r50_clip_blockcopy_030.py")
    det = build_detector(cfg, checkpoint=os.path.join(out,
                                                      "epoch_2_teacher.npz"))
    w = np.asarray(det.params["head"]["csp_cls"]["w"])
    assert np.isfinite(w).all() and np.abs(w).sum() > 0


def test_train_cli_resume(tmp_path):
    out = str(tmp_path / "work")
    common = ["--synthetic", "--epochs", "1", "--steps-per-epoch", "4",
              "--batch-size", "1", "--crop-height", "128",
              "--crop-width", "256", "--num-samples", "8",
              "--warmup-iters", "0", "--workers", "1", "--out", out]
    r1 = train_main(common)
    assert r1["step"] == 4
    r2 = train_main(common + ["--resume",
                              os.path.join(out, "latest_state.npz")])
    assert r2["step"] == 8  # optimizer step counter carried over
