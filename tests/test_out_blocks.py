"""OUT_BLOCKS lowering (``core/stepper.py``): semseg task outputs carried as
the block-layout canvas end-to-end.  Must be EXACTLY equivalent to the dense
carry — the per-block reward math is the same computation (0.25 bilinear
taps never cross block borders; reward pool is per-block max), and the
policy input assembly sees pixel-identical tensors — so whole trajectories
(grids, policy params, fetched outputs) must match."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.core import stepper as stepper_mod
from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
from blockcopy_tpu.models.swiftnet import (
    SwiftNetConfig, init_swiftnet, make_apply_fn)

CFG = SwiftNetConfig(backbone="resnet18", num_classes=19)
H, W = 256, 512
FRAME_SHAPE = (1, H, W, 3)


@pytest.fixture(scope="module")
def params():
    return init_swiftnet(jax.random.PRNGKey(0), CFG)


def run_clip(params, flag, monkeypatch, block_size=128, n_frames=5):
    monkeypatch.setattr(stepper_mod, "OUT_BLOCKS", flag)
    cfg = StepperConfig(block_size=block_size, train_interval=2)
    st = FixedCapacityStepper(make_apply_fn(CFG), cfg, FRAME_SHAPE,
                              capacity=4)
    state = st.init_state(params, jax.random.PRNGKey(1))
    first = jax.jit(st.first_step)
    step = jax.jit(st.step)
    rs = np.random.RandomState(0)
    base = rs.randn(*FRAME_SHAPE).astype(np.float32)
    grids, outs = [], []
    for t in range(n_frames):
        f = base.copy()
        f[:, 16 * t: 16 * t + 48, 16 * t: 16 * t + 48] += 2.0
        fn = first if t == 0 else step
        state = fn(params, state, jnp.asarray(f))
        grids.append(np.asarray(state["prev_grid"]))
        outs.append(np.asarray(st.fetch_outputs(state)))
    pol = np.asarray(
        jax.tree_util.tree_leaves(state["policy"]["params"])[0])
    return grids, outs, pol


@pytest.mark.parametrize("block_size", [128, 64])
def test_out_blocks_trajectory_matches_dense_carry(params, monkeypatch,
                                                   block_size):
    g_a, o_a, p_a = run_clip(params, False, monkeypatch, block_size)
    g_b, o_b, p_b = run_clip(params, True, monkeypatch, block_size)
    for t, (ga, gb) in enumerate(zip(g_a, g_b)):
        np.testing.assert_array_equal(ga, gb), t
    for t, (oa, ob) in enumerate(zip(o_a, o_b)):
        assert oa.shape == ob.shape  # fetch_outputs rebuilds dense
        np.testing.assert_allclose(oa, ob, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p_a, p_b, rtol=1e-5, atol=1e-7)


def run_clip_flag(params, flagname, flag, monkeypatch, n_frames=5):
    monkeypatch.setattr(stepper_mod, flagname, flag)
    cfg = StepperConfig(block_size=128, train_interval=2)
    st = FixedCapacityStepper(make_apply_fn(CFG), cfg, FRAME_SHAPE,
                              capacity=4)
    state = st.init_state(params, jax.random.PRNGKey(1))
    first = jax.jit(st.first_step)
    step = jax.jit(st.step)
    rs = np.random.RandomState(0)
    base = rs.randn(*FRAME_SHAPE).astype(np.float32)
    grids, outs = [], []
    for t in range(n_frames):
        f = base.copy()
        f[:, 16 * t: 16 * t + 48, 16 * t: 16 * t + 48] += 2.0
        state = (first if t == 0 else step)(params, state, jnp.asarray(f))
        grids.append(np.asarray(state["prev_grid"]))
        outs.append(np.asarray(st.fetch_outputs(state)))
    pol = np.asarray(jax.tree_util.tree_leaves(state["policy"]["params"])[0])
    return grids, outs, pol


def test_packed_out_trajectory_matches_dense_carry(params, monkeypatch):
    """PACKED_OUT (lane-packed (total+1, bs, bs*C) canvas) is a pure layout
    change: the dense outputs, grids, and policy trajectory must be
    IDENTICAL to the default carry."""
    g_a, o_a, p_a = run_clip_flag(params, "PACKED_OUT", False, monkeypatch)
    g_b, o_b, p_b = run_clip_flag(params, "PACKED_OUT", True, monkeypatch)
    for ga, gb in zip(g_a, g_b):
        np.testing.assert_array_equal(ga, gb)
    for oa, ob in zip(o_a, o_b):
        np.testing.assert_allclose(oa, ob, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(p_a, p_b, rtol=1e-6, atol=1e-8)


def test_out_blocks_state_shape(params, monkeypatch):
    """Under the flag the carried outputs leaf is the canvas itself
    (total+1 block rows), not a dense rebuild."""
    monkeypatch.setattr(stepper_mod, "OUT_BLOCKS", True)
    cfg = StepperConfig(block_size=128, train_interval=2)
    st = FixedCapacityStepper(make_apply_fn(CFG), cfg, FRAME_SHAPE,
                              capacity=4)
    state = st.init_state(params, jax.random.PRNGKey(1))
    assert state["outputs"].shape[0] == st.total + 1
    f = jnp.asarray(np.random.RandomState(1).randn(*FRAME_SHAPE), jnp.float32)
    state = jax.jit(st.first_step)(params, state, f)
    out = st.fetch_outputs(state)
    assert out.shape == (1, H // 4, W // 4, 19)
    assert np.isfinite(np.asarray(out)).all()
