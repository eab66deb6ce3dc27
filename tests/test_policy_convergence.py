"""Online-REINFORCE convergence: the execution rate must steer toward the
target, and the policy must prefer changing regions (the core capability
claim of BlockCopy).  Drives PolicyTrainRL directly with synthetic task
outputs so no task network is needed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu.core.argparser import default_settings
from blockcopy_tpu.policy.policies import build_policy_from_settings

H, W, BS = 256, 512, 64  # 4x8 grid = 32 blocks
C = 19


def synthetic_stream(frames, seed=0):
    """Frames with motion confined to the left half; outputs follow inputs
    (so KL information gain concentrates where motion is)."""
    rs = np.random.RandomState(seed)
    base = rs.randn(1, H, W, 3).astype(np.float32)
    outs_base = rs.randn(1, H // 4, W // 4, C).astype(np.float32)
    for t in range(frames):
        f = base.copy()
        f[:, (13 * t) % (H - 64):, : W // 2] += 1.5  # motion left half only
        o = outs_base.copy()
        o[:, (3 * t) % (H // 4 - 16):, : W // 8] += 2.0
        yield jnp.asarray(f), jnp.asarray(o)


def run_policy(target, frames=120, train_interval=2, arch="ref"):
    settings = default_settings(
        block_policy="rl_semseg", block_size=BS, block_target=target,
        block_train_interval=train_interval, block_num_classes=C,
        block_quantize_number_exec=0.0, block_policy_arch=arch,
    )
    policy = build_policy_from_settings(settings)
    meta = {"inputs": None, "outputs": None, "outputs_prev": None}
    rates = []
    grids = []
    t = 0
    for frame, out in synthetic_stream(frames):
        t += 1
        meta["inputs"] = frame
        meta = policy(meta)
        grids.append(np.asarray(meta["grid"])[0])
        # pretend the task model ran: outputs/frame_state from the stream
        meta["frame_state"] = frame
        meta["outputs_prev"] = meta["outputs"]
        meta["outputs"] = out
        meta = policy.optim(meta, train=(t % train_interval == 0))
        rates.append(meta["perc_exec"])
    return policy, rates, grids


class TestConvergence:
    def test_exec_rate_steers_to_target(self):
        policy, rates, _ = run_policy(target=0.25, frames=120)
        late = float(np.mean(rates[-40:]))
        assert abs(late - 0.25) < 0.1, late
        assert abs(policy.running_cost - 0.25) < 0.15, policy.running_cost

    def test_high_target_pulls_up(self):
        policy, rates, _ = run_policy(target=0.9, frames=100)
        late = float(np.mean(rates[-30:]))
        assert late > 0.6, late


class TestConvergenceFastArch:
    """The TPU-native 'fast' policy arch (space-to-depth trunk) must steer
    the execution rate like the reference arch.

    Motion preference is deliberately NOT asserted on this harness: it feeds
    oracle outputs that change regardless of execution, which flips the
    exploration structure (the reference arch shows no preference here
    either at these frame counts).  The real-loop motion-preference bar —
    information gain only where blocks actually executed — lives in
    ``test_stepper_parallel.py::test_fast_policy_arch_motion_preference``,
    where the fast arch reaches a stable ~3:1 moving:static exec ratio."""

    def test_exec_rate_steers_to_target(self):
        policy, rates, grids = run_policy(target=0.25, frames=120,
                                          arch="fast")
        late = float(np.mean(rates[-40:]))
        assert abs(late - 0.25) < 0.1, late

    def test_logit_grid_shape(self):
        import jax
        import jax.numpy as jnp
        from blockcopy_tpu.policy.net import (
            init_policy_net, policy_net_apply, policy_in_channels,
        )
        from blockcopy_tpu.utils.flops import policy_net_macs

        cin = policy_in_channels(C)
        params, bn = init_policy_net(jax.random.PRNGKey(0), cin, arch="fast")
        # policy input resolution = frame * 0.25 * (128 / block_size)
        ph, pw = int(H * 0.25 * 128 / BS), int(W * 0.25 * 128 / BS)
        x = jnp.zeros((1, ph, pw, cin), jnp.float32)
        logits, bn2 = policy_net_apply(params, bn, x, arch="fast")
        # /32 overall stride == one logit per block, like the ref arch
        assert logits.shape == (1, H // BS, W // BS, 1)
        # MACs mirror: fast is cheaper than ref in FLOPs too
        fast = policy_net_macs(ph, pw, C, arch="fast")
        ref = policy_net_macs(ph, pw, C)
        assert 0 < fast < ref, (fast, ref)


class TestHeadBiasInit:
    """r5: the fast arch's logit-head bias starts at logit(block_target) so
    initial sampling opens AT the target (the complexity-crush phase that
    swamped the IG signal at low targets is pre-satisfied); at target 0.5
    the bias is exactly 0 — the pre-r5 behavior."""

    def test_bias_matches_target_logit(self):
        import math

        import jax
        import numpy as np
        from blockcopy_tpu.core.argparser import default_settings
        from blockcopy_tpu.policy.policies import build_policy_from_settings

        for target in (0.25, 0.5, 0.75):
            pol = build_policy_from_settings(default_settings(
                block_target=target, block_policy_arch="fast"))
            b = float(np.asarray(pol.net_params["head1"]["b"])[0])
            assert b == pytest.approx(math.log(target / (1 - target)),
                                      abs=1e-6)
            # weights stay zero-init: probs are uniform sigmoid(bias)
            assert float(np.abs(
                np.asarray(pol.net_params["head1"]["w"])).max()) == 0.0

    def test_ref_arch_untouched(self):
        import numpy as np
        from blockcopy_tpu.core.argparser import default_settings
        from blockcopy_tpu.policy.policies import build_policy_from_settings

        pol = build_policy_from_settings(default_settings(
            block_target=0.25, block_policy_arch="ref"))
        # reference init parity: normal weights, zero bias
        assert float(np.abs(
            np.asarray(pol.net_params["head2"]["w"])).max()) > 0.0
        assert float(np.asarray(pol.net_params["head2"]["b"])[0]) == 0.0

    def test_stepper_policy_state_bias(self):
        import math

        import jax
        import numpy as np
        from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
        from blockcopy_tpu.models.swiftnet import (
            SwiftNetConfig, init_swiftnet, make_apply_fn)

        cfg = SwiftNetConfig(backbone="resnet18", num_classes=C)
        scfg = StepperConfig(block_size=BS, block_target=0.25,
                             train_interval=4, policy_arch="fast")
        stepper = FixedCapacityStepper(
            make_apply_fn(cfg), scfg, (1, H, W, 3), capacity=2)
        pstate = stepper.init_policy_state(jax.random.PRNGKey(0))
        b = float(np.asarray(pstate["params"]["head1"]["b"])[0])
        assert b == pytest.approx(math.log(0.25 / 0.75), abs=1e-6)
