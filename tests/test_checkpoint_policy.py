"""Policy-state persistence round trip through the engine and CLI flag, plus
the demo-folder dataset flow."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from blockcopy_tpu import BlockCopyModel
from blockcopy_tpu.core.argparser import default_settings
from blockcopy_tpu.models.swiftnet import SwiftNetConfig, init_swiftnet, make_apply_fn

CFG = SwiftNetConfig(backbone="resnet18")
H, W, BS = 256, 512, 128


@pytest.fixture(scope="module")
def params():
    return init_swiftnet(jax.random.PRNGKey(0), CFG)


def make_model(params):
    return BlockCopyModel(
        make_apply_fn(CFG), params,
        default_settings(block_size=BS, block_quantize_number_exec=0.5,
                         block_train_interval=2),
    )


class TestPolicyPersistence:
    def test_engine_policy_roundtrip(self, params, tmp_path):
        model = make_model(params)
        model.reset_temporal()
        rs = np.random.RandomState(0)
        for t in range(4):
            f = rs.randn(1, H, W, 3).astype(np.float32)
            model(jnp.asarray(f))
        path = str(tmp_path / "policy.npz")
        model.save_policy(path)
        assert os.path.exists(path)
        rc = model.policy.running_cost

        model2 = make_model(params)
        model2.load_policy(path)
        assert model2.policy.running_cost == pytest.approx(rc)
        a = jax.tree_util.tree_leaves(model.policy.net_params)[0]
        b = jax.tree_util.tree_leaves(model2.policy.net_params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state restored with its NamedTuple type
        assert hasattr(model2.policy.opt_state, "square_avg")
        # resumed model steps fine
        model2.reset_temporal()
        model2(jnp.asarray(rs.randn(1, H, W, 3).astype(np.float32)))

    def test_cli_policy_checkpoint_flag(self, tmp_path):
        from blockcopy_tpu.tasks.semseg import eval as cli
        p = str(tmp_path / "pol.npz")
        cli.main([
            "--synthetic", "--res", "256", "--clip-length", "3",
            "--num-clips-warmup", "1", "--num-clips-eval", "1",
            "--block-policy", "rl_semseg", "--model-checkpoint", "",
            "--policy-checkpoint", p,
        ])
        assert os.path.exists(p)

    def test_cli_policy_checkpoint_mesh_mode(self, tmp_path):
        """Regression: --policy-checkpoint used to log 'loading' and then
        silently skip both the load and the post-warmup save whenever
        --num-devices > 1.  Now: single-replica checkpoints broadcast over
        the mesh on load; device 0 is saved."""
        from blockcopy_tpu.tasks.semseg import eval as cli
        p = str(tmp_path / "pol_mesh.npz")
        common = [
            "--synthetic", "--res", "256", "--clip-length", "3",
            "--num-clips-warmup", "1", "--num-clips-eval", "2",
            "--block-policy", "rl_semseg", "--model-checkpoint", "",
            "--speed-mode", "--num-devices", "2", "--policy-checkpoint", p,
        ]
        cli.main(common)
        assert os.path.exists(p)
        # saved flat (single replica): loadable into a fresh stepper state
        from blockcopy_tpu.core.stepper import (
            FixedCapacityStepper, StepperConfig)
        from blockcopy_tpu.models.swiftnet import make_apply_fn
        from blockcopy_tpu.utils.checkpoint import load_npz
        st = FixedCapacityStepper(make_apply_fn(CFG),
                                  StepperConfig(block_size=128),
                                  (1, 256, 512, 3), capacity=2)
        like = st.init_policy_state(jax.random.PRNGKey(5))
        loaded = load_npz(p, like)
        assert np.asarray(loaded["params"]["conv1"]["w"]).ndim == 4
        # second run loads it back through the mesh path (exercises the
        # broadcast) without error
        cli.main(common)

    def test_cli_policy_checkpoint_mesh_orbax(self, tmp_path):
        """Mesh-mode --policy-checkpoint with a non-.npz path goes through
        orbax: the FULL mesh-stacked policy pytree is saved as-is (no host
        stack/unstack, per-replica sampling keys preserved) and restored
        on the next run."""
        from blockcopy_tpu.tasks.semseg import eval as cli
        p = str(tmp_path / "pol_orbax")
        common = [
            "--synthetic", "--res", "256", "--clip-length", "3",
            "--num-clips-warmup", "1", "--num-clips-eval", "2",
            "--block-policy", "rl_semseg", "--model-checkpoint", "",
            "--speed-mode", "--num-devices", "2", "--policy-checkpoint", p,
        ]
        cli.main(common)
        assert os.path.isdir(p)  # orbax checkpoints are directories
        # the stored tree is mesh-stacked: leading device axis of 2
        from blockcopy_tpu.core.stepper import (
            FixedCapacityStepper, StepperConfig)
        from blockcopy_tpu.models.swiftnet import make_apply_fn
        from blockcopy_tpu.parallel import clip_parallel
        from blockcopy_tpu.utils.checkpoint import load_orbax
        st = FixedCapacityStepper(make_apply_fn(CFG),
                                  StepperConfig(block_size=128),
                                  (1, 256, 512, 3), capacity=2)
        params = init_swiftnet(jax.random.PRNGKey(0), CFG)
        state = clip_parallel.init_parallel_state(
            st, params, jax.random.PRNGKey(5), 2)
        loaded = load_orbax(p, state["policy"])
        w = np.asarray(loaded["params"]["conv1"]["w"])
        assert w.ndim == 5 and w.shape[0] == 2
        # per-replica sampling keys restored distinct (not broadcast)
        keys = np.asarray(loaded["key"])
        assert not np.array_equal(keys[0], keys[1])
        # second run restores through the orbax path without error
        cli.main(common)


class TestDetectionPolicyPersistence:
    """The detection CLI's --policy-checkpoint (VERDICT r3 item 6): same
    npz/orbax contract as the semseg CLI, shared via utils/policy_ckpt.py,
    so the 300-400 clip detection warmup is amortizable."""

    COMMON = [
        "--synthetic", "--res", "256", "--clip-length", "3",
        "--num-clips-warmup", "1", "--num-clips-eval", "1",
        "--workers", "0",
    ]

    def test_cli_ladder_roundtrip(self, tmp_path):
        from blockcopy_tpu.tasks.detection import eval as cli
        p = str(tmp_path / "detpol.npz")
        cli.main(self.COMMON + ["--policy-checkpoint", p])
        assert os.path.exists(p)
        # second run loads it back through the ladder path without error
        cli.main(self.COMMON + ["--policy-checkpoint", p])

    def test_cli_speed_mode_roundtrip(self, tmp_path):
        from blockcopy_tpu.tasks.detection import eval as cli
        p = str(tmp_path / "detpol_step.npz")
        args = self.COMMON + ["--speed-mode", "--policy-checkpoint", p]
        cli.main(args)
        assert os.path.exists(p)
        # the saved pytree uses stepper naming and reloads exactly
        from blockcopy_tpu.core.stepper import StepperConfig
        from blockcopy_tpu.models.csp import CSPConfig
        from blockcopy_tpu.tasks.detection.stepper import DetectionStepper
        from blockcopy_tpu.utils.checkpoint import load_npz
        st = DetectionStepper(CSPConfig(),
                              StepperConfig(block_size=128, num_classes=1),
                              (1, 256, 512, 3), capacity=2)
        like = st.init_policy_state(jax.random.PRNGKey(5))
        loaded = load_npz(p, like)
        assert np.asarray(loaded["params"]["conv1"]["w"]).ndim == 4
        cli.main(args)  # reload path

    def test_cli_mesh_orbax_roundtrip(self, tmp_path):
        from blockcopy_tpu.tasks.detection import eval as cli
        p = str(tmp_path / "detpol_orbax")
        args = self.COMMON + ["--speed-mode", "--num-devices", "2",
                              "--num-clips-eval", "2",
                              "--policy-checkpoint", p]
        cli.main(args)
        assert os.path.isdir(p)  # orbax checkpoints are directories
        cli.main(args)  # restore through the mesh/orbax path


class TestDemoDataset:
    def test_demo_dir_cli(self, tmp_path):
        from blockcopy_tpu.tasks.semseg import eval as cli
        rs = np.random.RandomState(0)
        for i in range(3):
            Image.fromarray(
                (rs.rand(64, 128, 3) * 255).astype(np.uint8)
            ).save(tmp_path / f"frame_{i:03d}.png")
        results = cli.main([
            "--demo-dir", str(tmp_path), "--res", "256",
            "--num-clips-warmup", "2", "--num-clips-eval", "3",
            "--block-policy", "none", "--model-checkpoint", "",
        ])
        assert results["fps"] > 0


def test_stepper_policy_state_roundtrip(tmp_path):
    """Speed-mode policy state (stepper naming) saves and reloads exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
    from blockcopy_tpu.models.swiftnet import (
        SwiftNetConfig, init_swiftnet, make_apply_fn)
    from blockcopy_tpu.utils.checkpoint import load_npz, save_params

    cfg = SwiftNetConfig(backbone="resnet18")
    st = FixedCapacityStepper(make_apply_fn(cfg),
                              StepperConfig(block_size=128),
                              (1, 256, 256, 3), capacity=2)
    pol = st.init_policy_state(jax.random.PRNGKey(3))
    pol = {**pol, "running_cost": jnp.float32(0.42)}
    path = str(tmp_path / "pol.npz")
    save_params(path, pol)
    fresh = st.init_policy_state(jax.random.PRNGKey(9))
    loaded = load_npz(path, fresh)
    assert float(loaded["running_cost"]) == np.float32(0.42)
    np.testing.assert_array_equal(np.asarray(loaded["key"]),
                                  np.asarray(pol["key"]))
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["conv1"]["w"]),
        np.asarray(pol["params"]["conv1"]["w"]))
