"""End-to-end engine tests: the full per-frame BlockCopy pipeline with each
policy, on a synthetic clip (policy-oracle tests per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu import BlockCopyModel
from blockcopy_tpu.core.argparser import default_settings
from blockcopy_tpu.models.swiftnet import (
    SwiftNetConfig,
    init_swiftnet,
    make_apply_fn,
    swiftnet_apply,
)
from blockcopy_tpu.core.blocked import ExecCtx

CFG = SwiftNetConfig(backbone="resnet18", num_classes=19)
H, W, BS = 256, 512, 128


@pytest.fixture(scope="module")
def params():
    return init_swiftnet(jax.random.PRNGKey(0), CFG)


def make_model(params, policy, **kw):
    settings = default_settings(
        block_policy=policy, block_size=BS,
        block_quantize_number_exec=0.5,  # ladder {4, 8} -> few compiles
        **kw,
    )
    return BlockCopyModel(make_apply_fn(CFG), params, settings)


def synthetic_clip(frames=4, seed=0, moving=True):
    rs = np.random.RandomState(seed)
    base = rs.randn(1, H, W, 3).astype(np.float32)
    clip = []
    for t in range(frames):
        f = base.copy()
        if moving and t > 0:
            # moving square in one corner block; rest static
            f[:, 8 * t : 8 * t + 40, 8 * t : 8 * t + 40, :] += 3.0
        clip.append(jnp.asarray(f))
    return clip


class TestPolicyOracles:
    def test_policy_none_freezes_after_frame2(self, params):
        """Reference quirk preserved: PolicyNone/Random key off
        ``outputs_prev`` which is only non-None from frame 3 on
        (``policy/policy.py:189`` + ``core/blockcopy.py:82``), so frames 1-2
        execute everything and the output freezes afterwards."""
        model = make_model(params, "none")
        model.reset_temporal()
        clip = synthetic_clip(4)
        outs = [np.asarray(model(f)) for f in clip]
        assert model.policy_meta["perc_exec"] == 0.0
        np.testing.assert_array_equal(outs[2], outs[1])
        np.testing.assert_array_equal(outs[3], outs[1])

    def test_policy_all_matches_single_frame_blocked(self, params):
        model = make_model(params, "all")
        model.reset_temporal()
        clip = synthetic_clip(2, moving=False)
        out0 = np.asarray(model(clip[0]))
        out1 = np.asarray(model(clip[1]))
        # same input, all blocks recomputed -> identical output
        np.testing.assert_array_equal(out0, out1)
        assert model.policy.stats.get_exec_percentage() == 1.0

    def test_policy_random_executes_first_frame_fully(self, params):
        model = make_model(params, "random")
        model.reset_temporal()
        clip = synthetic_clip(4)
        model(clip[0])
        assert model.policy_meta["perc_exec"] == 1.0
        model(clip[1])
        assert model.policy_meta["perc_exec"] == 1.0  # reference quirk, see above
        model(clip[2])
        model(clip[3])
        # quantization: count is a multiple of total*quantum (8 * 0.5 = 4)
        count = model.policy_meta["num_exec"]
        assert count % 4 == 0

    def test_reset_temporal_reruns_all(self, params):
        model = make_model(params, "none")
        model.reset_temporal()
        clip = synthetic_clip(3)
        for f in clip:
            model(f)
        assert model.policy_meta["perc_exec"] == 0.0
        model.reset_temporal()
        model(clip[2])
        assert model.policy_meta["perc_exec"] == 1.0

    def test_skipped_blocks_copy_previous_output(self, params):
        """With a manually forced partial grid via random policy, outputs of
        skipped blocks must equal the previous frame's outputs exactly."""
        model = make_model(params, "random")
        model.reset_temporal()
        clip = synthetic_clip(3, moving=True)
        model(clip[0])
        out0 = np.asarray(model(clip[1]))   # frame 2 still all-exec (quirk)
        out1 = np.asarray(model(clip[2]))   # frame 3: random subset
        grid = np.asarray(model.policy_meta["grid"])  # (1, GH, GW)
        gh, gw = grid.shape[1], grid.shape[2]
        obs = BS // 4  # output block size at stride 4
        for gy in range(gh):
            for gx in range(gw):
                if not grid[0, gy, gx]:
                    np.testing.assert_array_equal(
                        out1[0, gy * obs:(gy + 1) * obs, gx * obs:(gx + 1) * obs],
                        out0[0, gy * obs:(gy + 1) * obs, gx * obs:(gx + 1) * obs],
                        err_msg=f"skipped block ({gy},{gx}) changed",
                    )


class TestBatch:
    def test_batch2_engine(self, params):
        """Batch >1 (reference speed configs use --batch-size 2): the grid
        flattens jointly over the batch, each image keeps its own temporal
        state rows."""
        model = make_model(params, "random")
        model.reset_temporal()
        rs = np.random.RandomState(7)
        clip = [jnp.asarray(rs.randn(2, H, W, 3).astype(np.float32))
                for _ in range(3)]
        for f in clip:
            out = model(f)
        assert out.shape == (2, H // 4, W // 4, 19)
        assert model.policy_meta["num_total"] == 2 * (H // BS) * (W // BS)


class TestStepperMacs:
    def test_macs_scale_with_capacity(self, params):
        from blockcopy_tpu.core.stepper import (
            FixedCapacityStepper, StepperConfig,
        )
        cfg = StepperConfig(block_size=BS)
        s4 = FixedCapacityStepper(make_apply_fn(CFG), cfg, (1, H, W, 3),
                                  capacity=4)
        s8 = FixedCapacityStepper(make_apply_fn(CFG), cfg, (1, H, W, 3),
                                  capacity=8)
        m4 = s4.macs_per_step(params, policy=False)
        m8 = s8.macs_per_step(params, policy=False)
        assert m8 > m4 > 0
        # SPP runs dense regardless of capacity, so scaling is sublinear
        assert 1.5 < m8 / m4 < 2.0


class TestRLPolicy:
    def test_rl_semseg_runs_and_updates(self, params):
        model = make_model(params, "rl_semseg", block_train_interval=2)
        model.reset_temporal()
        p0 = jax.tree_util.tree_leaves(model.policy.net_params)[0]
        clip = synthetic_clip(5)
        for f in clip:
            out = model(f)
        assert out.shape == (1, H // 4, W // 4, 19)
        # frame 1 executed everything
        assert model.policy.stats.total > 0
        # policy parameters changed (REINFORCE steps ran at frames 2 and 4)
        p1 = jax.tree_util.tree_leaves(model.policy.net_params)[0]
        assert not np.array_equal(np.asarray(p0), np.asarray(p1))
        # running cost tracked
        assert model.policy.running_cost is not None
        assert 0.0 <= model.policy.running_cost <= 1.0
        # information gain was computed and stored
        assert "information_gain" in model.policy_meta

    def test_rl_policy_state_roundtrip(self, params):
        model = make_model(params, "rl_semseg")
        model.reset_temporal()
        for f in synthetic_clip(3):
            model(f)
        state = model.policy.state()
        model2 = make_model(params, "rl_semseg")
        model2.policy.load_state(state)
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(model2.policy.net_params)[0]),
            np.asarray(jax.tree_util.tree_leaves(model.policy.net_params)[0]),
        )


class TestEngineGuards:
    def test_geometry_change_raises_clear_error(self, params):
        """Resolution changes must fail with a clear message, not an opaque
        XLA shape error from stale compiled programs."""
        model = make_model(params, "random")
        model.reset_temporal()
        model(synthetic_clip(1)[0])
        model.reset_temporal()
        import pytest
        with pytest.raises(ValueError, match="geometry-static"):
            model(jnp.zeros((1, H // 2, W // 2, 3)))

    def test_running_cost_zero_roundtrips(self, params, tmp_path):
        """A legitimate running_cost of 0.0 must not collapse into the -1.0
        'uninitialized' sentinel on save (regression: falsy-zero check)."""
        model = make_model(params, "rl_semseg")
        model.reset_temporal()
        model(synthetic_clip(1)[0])
        model.policy.running_cost = 0.0
        p = str(tmp_path / "pol0.npz")
        model.save_policy(p)
        model2 = make_model(params, "rl_semseg")
        model2.load_policy(p)
        assert model2.policy.running_cost == 0.0
