"""Closed-loop multi-frame policy-trajectory parity vs the reference torch
``PolicyTrainRL`` (``blockcopy/blockcopy/policy/policy.py:219-370``).

Single-update parity (``test_policy_net_reference_parity.py``) pins one
REINFORCE step; this test drives BOTH implementations through a 24-frame
rollout with *injected identical* inputs and grids and asserts the
parameter trajectories stay together — catching compounding drift in the
running-cost EMA, the RMSprop accumulators, or the reward wiring that a
single update can't see.

The reference side runs unmodified (its own forward samples the grid from
the torch RNG); our side receives the reference's sampled grid, perc_exec,
and the same frame/output arrays each step, so any divergence is numeric,
not stochastic.  Geometry 512x512 / block 128 gives 16 blocks, where the
reference's 1/16 count-quantization multiple is 1 == a no-op, removing its
``random.sample`` host-RNG coupling from the comparison.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_policy_net_reference_parity import convert_policy_state_dict
from test_reference_model_parity import _install_blockcopy_stub  # noqa: E402

REF_BC = "/root/reference/blockcopy"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_BC),
                                reason="reference tree not available")

N_FRAMES = 24
H = W = 512
NUM_CLASSES = 19


def test_rollout_trajectory_parity(monkeypatch):
    import blockcopy_tpu.policy.net as net

    monkeypatch.setattr(net, "COMPUTE_DTYPE", jnp.float32)
    _install_blockcopy_stub()
    if REF_BC not in sys.path:
        sys.path.insert(0, REF_BC)
    import blockcopy.policy.policy as ref_policy_mod

    from blockcopy_tpu.core.argparser import default_settings
    from blockcopy_tpu.policy.policies import (
        build_policy_from_settings as my_build)

    settings = default_settings(block_policy="rl_semseg",
                                block_num_classes=NUM_CLASSES,
                                block_size=128)
    torch.manual_seed(0)
    ref_pol = ref_policy_mod.build_policy_from_settings(settings)
    ref_pol.net.train()

    mine = my_build(settings)
    mine.net_params, mine.bn_state = convert_policy_state_dict(
        ref_pol.net.state_dict())
    mine.running_cost = None
    init_params = {k: np.asarray(v).copy() for k, v in
                   jax.tree_util.tree_leaves_with_path(mine.net_params)}

    rs = np.random.RandomState(11)
    base = rs.randn(1, 3, H, W).astype(np.float32)

    def frame(t):
        f = base.copy()
        y, x = (37 * t) % (H - 96), (53 * t) % (W - 96)
        f[:, :, y:y + 96, x:x + 96] += 2.0
        return f

    def outputs(t):
        o = np.zeros((1, NUM_CLASSES, H, W), np.float32)
        rs2 = np.random.RandomState(100 + t)
        o += rs2.randn(1, NUM_CLASSES, 1, 1).astype(np.float32)
        y, x = (37 * t) % (H - 96), (53 * t) % (W - 96)
        o[:, (t % NUM_CLASSES), y:y + 96, x:x + 96] += 4.0
        return o

    prev_grid = np.ones((1, 1, H // 128, W // 128), np.float32)
    rc_trace_ref, rc_trace_mine = [], []
    out_prev = outputs(0)
    # frame-0 output repr, as the pipeline would have stored it
    orepr = ref_pol.information_gain.get_output_repr(
        {"outputs": torch.from_numpy(out_prev)}).numpy()

    for t in range(1, N_FRAMES + 1):
        f = frame(t)
        fs = frame(t - 1)  # frame_state: the previous frame, as in the FIFO
        out = outputs(t)

        meta = {"inputs": torch.from_numpy(f),
                "frame_state": torch.from_numpy(fs),
                "output_repr": torch.from_numpy(orepr),
                "grid": torch.from_numpy(prev_grid),
                "outputs": torch.from_numpy(out),
                "outputs_prev": torch.from_numpy(out_prev)}
        meta = ref_pol(meta)                    # samples ITS grid
        sampled_grid = meta["grid"].numpy()[:, 0].astype(bool)
        perc = float(meta["perc_exec"])
        meta = ref_pol.optim(meta, train=True)

        cache_x = net.assemble_policy_input(
            jnp.asarray(f.transpose(0, 2, 3, 1)),
            jnp.asarray(fs.transpose(0, 2, 3, 1)),
            jnp.asarray(orepr.transpose(0, 2, 3, 1)),
            jnp.asarray(prev_grid[:, 0]), 128)
        my_meta = {
            "outputs": jnp.asarray(out.transpose(0, 2, 3, 1)),
            "outputs_prev": jnp.asarray(out_prev.transpose(0, 2, 3, 1)),
            "grid": jnp.asarray(sampled_grid),
            "perc_exec": perc,
            "_rl_cache": cache_x,
        }
        mine.optim(my_meta, train=True)

        rc_trace_ref.append(float(ref_pol.running_cost))
        rc_trace_mine.append(float(mine.running_cost))

        out_prev = out
        orepr = meta["output_repr"].numpy()
        prev_grid = sampled_grid[:, None].astype(np.float32)

    # the running-cost EMA is pure host float math: exact to fp64 noise
    np.testing.assert_allclose(rc_trace_mine, rc_trace_ref, rtol=0,
                               atol=1e-9)

    # Parameter trajectories after 24 compounding REINFORCE updates.
    # RMSprop's g/sqrt(sq) is ill-conditioned where a gradient is ~0 (the
    # step degenerates to lr/sqrt(1-alpha)*sign(g) = 1e-3*sign(noise)), so
    # elementwise sign flips of a few steps are the cross-framework fp32
    # floor.  What a real reward/EMA/optimizer bug CANNOT survive:
    #  - delta-trajectory correlation (wrong signed-reward wiring flips it,
    #    measured 0.991-1.000 across all tensors when healthy);
    #  - max abs divergence bounded by a few step sizes (wrong lr/alpha/
    #    eps/wd compounds far past this over 24 frames).
    step = 1e-4 / np.sqrt(1 - 0.99)  # lr / sqrt(1-alpha) = 1e-3
    ref_params, _ = convert_policy_state_dict(ref_pol.net.state_dict())
    ref_flat = dict(jax.tree_util.tree_leaves_with_path(ref_params))
    init_flat = init_params  # already keyed by path tuples
    checked = 0
    for path, ours in jax.tree_util.tree_leaves_with_path(mine.net_params):
        a = np.asarray(ours)
        b = np.asarray(ref_flat[path])
        d_mine = (a - init_flat[path]).ravel()
        d_ref = (b - init_flat[path]).ravel()
        assert np.abs(d_ref).max() > 0, f"reference never updated {path}"
        corr = float(np.corrcoef(d_mine, d_ref)[0, 1]) if d_ref.size > 1 \
            else float(np.sign(d_mine[0]) == np.sign(d_ref[0]))
        assert corr > 0.97, f"rollout-{path}: delta corr {corr:.4f}"
        max_div = float(np.abs(a - b).max())
        assert max_div < 5 * step, \
            f"rollout-{path}: diverged {max_div:.2e} (> 5 RMSprop steps)"
        checked += 1
    assert checked > 20
