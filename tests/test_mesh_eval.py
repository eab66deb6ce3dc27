"""Mesh-sharded evaluation through the semseg CLI: N=1 and N=8 virtual
devices must produce (near-)identical metrics on the same synthetic clips.

(Live replacement for the reference's dead rank-sharded eval,
``tools/test_city_person.py:128-190``.)
"""

from blockcopy_tpu.tasks.semseg.eval import main

COMMON = ["--synthetic", "--res", "256", "--clip-length", "3",
          "--num-clips-warmup", "1", "--num-clips-eval", "8",
          "--block-policy", "rl_semseg", "--speed-mode",
          "--model-checkpoint", ""]


def test_mesh_eval_matches_single_device():
    r1 = main(COMMON + ["--num-devices", "1"])
    r8 = main(COMMON + ["--num-devices", "8"])
    # same clips, same model; the only divergence is the policy update
    # schedule (sequential clips vs pmean over 8 parallel clips)
    assert abs(r1["Mean IoU"] - r8["Mean IoU"]) < 0.02, (r1, r8)
    assert r8["perc_exec"] == r1["perc_exec"]
    assert r8["gmacs_per_image"] == r1["gmacs_per_image"]


def test_speed_mode_fast_arch_cli():
    """Regression: the CLI's phase-boundary NaN guard must be arch-agnostic
    (it used to index the ref-arch 'conv1' key and crashed any
    --block-policy-arch fast run after warmup)."""
    r = main(COMMON + ["--num-devices", "1", "--block-policy-arch", "fast"])
    assert r["fps"] > 0


def test_num_devices_over_available_rejected():
    import pytest
    from blockcopy_tpu.parallel.clip_parallel import make_mesh

    with pytest.raises(ValueError, match="available"):
        make_mesh(1000)
