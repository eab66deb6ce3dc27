"""Fixed-capacity stepper (speed mode) and mesh data-parallel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
from blockcopy_tpu.models.swiftnet import SwiftNetConfig, init_swiftnet, make_apply_fn
from blockcopy_tpu.parallel import clip_parallel

CFG = SwiftNetConfig(backbone="resnet18", num_classes=19)
H, W, BS = 256, 512, 128
FRAME_SHAPE = (1, H, W, 3)


@pytest.fixture(scope="module")
def params():
    return init_swiftnet(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def stepper():
    cfg = StepperConfig(block_size=BS, train_interval=2)
    return FixedCapacityStepper(make_apply_fn(CFG), cfg, FRAME_SHAPE,
                                capacity=4)


def frames(n=4, seed=0):
    rs = np.random.RandomState(seed)
    base = rs.randn(*FRAME_SHAPE).astype(np.float32)
    out = [jnp.asarray(base)]
    for t in range(1, n):
        f = base.copy()
        f[:, 16 * t : 16 * t + 32, 16 * t : 16 * t + 32] += 2.0
        out.append(jnp.asarray(f))
    return out


class TestStepper:
    def test_clip_loop(self, params, stepper):
        state = stepper.init_state(params, jax.random.PRNGKey(1))
        first = jax.jit(stepper.first_step)
        step = jax.jit(stepper.step)
        fs = frames(4)
        state = first(params, state, fs[0])
        assert int(state["frame_idx"]) == 1
        out1 = np.asarray(state["outputs"])
        assert out1.shape == (1, H // 4, W // 4, 19)
        for f in fs[1:]:
            state = step(params, state, f)
        assert int(state["frame_idx"]) == 4
        # exactly `capacity` blocks executed each steady frame
        assert float(state["prev_grid"].sum()) == stepper.capacity
        # skipped blocks of the final frame kept earlier outputs
        assert np.isfinite(np.asarray(state["outputs"])).all()
        # running cost moved below 1 (EMA over perc_exec 1.0, .5, .5, .5)
        assert 0.4 < float(state["policy"]["running_cost"]) < 1.0

    def test_policy_trains_on_interval(self, params, stepper):
        state = stepper.init_state(params, jax.random.PRNGKey(2))
        p0 = np.asarray(jax.tree_util.tree_leaves(state["policy"]["params"])[0])
        first = jax.jit(stepper.first_step)
        step = jax.jit(stepper.step)
        fs = frames(3)
        state = first(params, state, fs[0])
        state = step(params, state, fs[1])  # frame 2: trains (interval 2)
        p2 = np.asarray(jax.tree_util.tree_leaves(state["policy"]["params"])[0])
        assert not np.array_equal(p0, p2)
        state = step(params, state, fs[2])  # frame 3: no train
        p3 = np.asarray(jax.tree_util.tree_leaves(state["policy"]["params"])[0])
        np.testing.assert_array_equal(p2, p3)

    def test_fast_policy_arch_clip_loop(self, params):
        """Speed mode with the TPU-native 'fast' policy arch: steps, holds
        capacity, and the REINFORCE update trains the fast net."""
        cfg = StepperConfig(block_size=BS, train_interval=2,
                            policy_arch="fast")
        stepper = FixedCapacityStepper(make_apply_fn(CFG), cfg, FRAME_SHAPE,
                                       capacity=4)
        state = stepper.init_state(params, jax.random.PRNGKey(7))
        assert "stem" in state["policy"]["params"]  # fast-arch pytree
        first = jax.jit(stepper.first_step)
        step = jax.jit(stepper.step)
        fs = frames(4)
        state = first(params, state, fs[0])
        p0 = np.asarray(
            jax.tree_util.tree_leaves(state["policy"]["params"])[0])
        for f in fs[1:]:
            state = step(params, state, f)
        assert float(state["prev_grid"].sum()) == stepper.capacity
        assert np.isfinite(np.asarray(state["outputs"])).all()
        p3 = np.asarray(
            jax.tree_util.tree_leaves(state["policy"]["params"])[0])
        assert not np.array_equal(p0, p3)
        assert stepper.macs_breakdown_per_step(params)["policy"] > 0

    def test_fast_policy_arch_motion_preference(self, params):
        """Real-loop convergence bar for the fast arch: with a bright square
        moving only in the LEFT half, the trained policy must execute left
        blocks more than right blocks (information gain here is the real
        one — nonzero only where blocks actually executed)."""
        scfg = StepperConfig(block_size=64, block_target=0.25,
                             train_interval=2, policy_arch="fast")
        stepper = FixedCapacityStepper(make_apply_fn(CFG), scfg,
                                       FRAME_SHAPE, capacity=8)  # 4x8 grid
        state = stepper.init_state(params, jax.random.PRNGKey(1))
        first = jax.jit(stepper.first_step, donate_argnums=(1,))
        step = jax.jit(stepper.step, donate_argnums=(1,))
        rs = np.random.RandomState(0)
        base = rs.randn(*FRAME_SHAPE).astype(np.float32)

        def frame(t):
            f = base.copy()
            y, x = (23 * t) % (H - 64), (17 * t) % (W // 2 - 64)
            f[:, y:y + 64, x:x + 64] += 2.5
            return jnp.asarray(f)

        state = first(params, state, frame(0))
        grids = []
        for t in range(1, 81):
            state = step(params, state, frame(t))
            grids.append(np.asarray(state["prev_grid"])[0])
        lg = np.stack(grids[-40:])
        left, right = lg[:, :, :4].mean(), lg[:, :, 4:].mean()
        assert left > right, (left, right)

    def test_policy_finite_guard_sees_all_leaves(self, params, stepper):
        """A NaN confined to a NON-first param leaf must trip the guard
        (the round-2 guard checked only the first leaf)."""
        state = stepper.init_state(params, jax.random.PRNGKey(4))
        FixedCapacityStepper.check_policy_finite(state["policy"], "warmup")
        leaves, treedef = jax.tree_util.tree_flatten(state["policy"]["params"])
        assert len(leaves) > 1
        leaves[-1] = leaves[-1].at[(0,) * leaves[-1].ndim].set(jnp.nan)
        bad = {**state["policy"],
               "params": jax.tree_util.tree_unflatten(treedef, leaves)}
        with pytest.raises(FloatingPointError):
            FixedCapacityStepper.check_policy_finite(bad, "warmup")

    def test_reset_temporal_keeps_policy(self, params, stepper):
        state = stepper.init_state(params, jax.random.PRNGKey(3))
        state = jax.jit(stepper.first_step)(params, state, frames(1)[0])
        rc = float(state["policy"]["running_cost"])
        state2 = stepper.reset_temporal(state)
        assert int(state2["frame_idx"]) == 0
        assert float(state2["policy"]["running_cost"]) == rc


class TestClipParallel:
    def test_eight_device_mesh_step(self, params):
        n_dev = len(jax.devices())
        assert n_dev == 8, "conftest should provide 8 virtual CPU devices"
        cfg = StepperConfig(block_size=BS, train_interval=1)
        stepper = FixedCapacityStepper(make_apply_fn(CFG), cfg, FRAME_SHAPE,
                                       capacity=4)
        mesh = clip_parallel.make_mesh(n_dev)
        state = clip_parallel.init_parallel_state(
            stepper, params, jax.random.PRNGKey(4), n_dev
        )
        first, step = clip_parallel.build_parallel_steps(stepper, mesh)
        rs = np.random.RandomState(5)
        fb1 = jnp.asarray(rs.randn(n_dev, *FRAME_SHAPE).astype(np.float32))
        fb2 = jnp.asarray(rs.randn(n_dev, *FRAME_SHAPE).astype(np.float32))
        # replicated start: conv weights identical, sampling keys distinct
        # (regression: leaves[0] is a zero-init BN beta, identical for ANY
        # seed — the sync check must use a drawn weight)
        w0 = np.asarray(state["policy"]["params"]["conv1"]["w"])
        for d in range(1, n_dev):
            np.testing.assert_array_equal(w0[0], w0[d])
        kk = np.asarray(state["policy"]["key"])
        assert len({tuple(k) for k in kk.tolist()}) == n_dev
        state = first(params, state, fb1)
        state = step(params, state, fb2)
        outs = np.asarray(state["outputs"])
        assert outs.shape == (n_dev, 1, H // 4, W // 4, 19)
        assert np.isfinite(outs).all()
        # pmean'd REINFORCE: policy params stay identical across devices
        # after a training step
        pp = np.asarray(state["policy"]["params"]["conv1"]["w"])
        assert not np.array_equal(pp[0], w0[0])  # it did train
        for d in range(1, n_dev):
            np.testing.assert_array_equal(pp[0], pp[d])
        # different clips -> different grids (devices act independently)
        grids = np.asarray(state["prev_grid"])
        assert grids.sum(axis=(1, 2, 3)).min() == 4  # capacity each
