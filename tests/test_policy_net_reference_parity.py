"""Policy-net numerical parity vs the reference's actual torch PolicyNet
(``blockcopy/blockcopy/policy/net.py`` + ``policy/resnet.py``): same input,
same (converted) weights, train-mode BatchNorm — logits must agree.

The reference never checkpoints the policy, so no production converter
exists; the mapping here is test scaffolding that pins the architecture
(resnet8 x2-width trunk, 3-layer strided head, BN momentum 0.02)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_reference_model_parity import (  # noqa: E402
    _install_blockcopy_stub,
    assert_close_normalized,
)

REF_BC = "/root/reference/blockcopy"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_BC),
                                reason="reference tree not available")


@pytest.fixture(scope="module")
def ref_policy_net():
    _install_blockcopy_stub()
    if REF_BC not in sys.path:
        sys.path.insert(0, REF_BC)
    from blockcopy.policy.net import PolicyNet
    return PolicyNet


def convert_policy_state_dict(sd):
    """torch PolicyNet state_dict -> (params, bn_state) pytrees of
    ``blockcopy_tpu.policy.net``.

    Every tensor is COPIED: ``jnp.asarray`` on the CPU backend zero-copies
    a contiguous numpy view of a torch tensor, so without the copy the
    returned pytree would alias live torch parameter storage — a later
    in-place ``optimizer.step()`` on the torch side silently mutates the
    "converted" params (burned a debugging session in the rollout-parity
    work; only BN vectors aliased because conv weights go through a
    non-contiguous transpose that forces a copy anyway)."""
    def _np(t):
        return np.array(np.asarray(t), copy=True)

    def conv(key):
        return {"w": jnp.asarray(_np(sd[key]).transpose(2, 3, 1, 0))}

    def bn(prefix):
        p = {"gamma": jnp.asarray(_np(sd[f"{prefix}.weight"])),
             "beta": jnp.asarray(_np(sd[f"{prefix}.bias"]))}
        s = {"mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
             "var": jnp.asarray(_np(sd[f"{prefix}.running_var"]))}
        return p, s

    params = {"conv1": conv("backbone.conv1.weight")}
    bn_state = {}
    params["bn1"], bn_state["bn1"] = bn("backbone.bn1")
    for i in range(1, 4):
        pre = f"backbone.layer{i}.0"
        p = {"conv1": conv(f"{pre}.conv1.weight"),
             "conv2": conv(f"{pre}.conv2.weight")}
        s = {}
        p["bn1"], s["bn1"] = bn(f"{pre}.bn1")
        p["bn2"], s["bn2"] = bn(f"{pre}.bn2")
        if f"{pre}.downsample.0.weight" in sd:
            p["down_conv"] = conv(f"{pre}.downsample.0.weight")
            p["down_bn"], s["down_bn"] = bn(f"{pre}.downsample.1")
        params[f"layer{i}"] = p
        bn_state[f"layer{i}"] = s
    params["head0"] = conv("layers.0.0.weight")
    params["head0_bn"], bn_state["head0_bn"] = bn("layers.0.1")
    params["head1"] = conv("layers.1.0.weight")
    params["head1_bn"], bn_state["head1_bn"] = bn("layers.1.1")
    params["head2"] = conv("layers.2.0.weight")
    params["head2"]["b"] = jnp.asarray(_np(sd["layers.2.0.bias"]))
    return params, bn_state


def test_policy_net_forward_parity(ref_policy_net, monkeypatch):
    import blockcopy_tpu.policy.net as net

    monkeypatch.setattr(net, "COMPUTE_DTYPE", jnp.float32)

    torch.manual_seed(0)  # reference init draws from torch's global RNG
    tnet = ref_policy_net(block_size=128, task_num_classes=19)
    tnet.train()  # the reference asserts train-mode BN (policy.py:280)
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)

    rs = np.random.RandomState(1)
    h, w = 256, 512
    frame = rs.randn(1, 3, h, w).astype(np.float32)
    frame_state = rs.randn(1, 3, h, w).astype(np.float32)
    output_repr = rs.randn(1, 19, h // 4, w // 4).astype(np.float32)
    grid = (rs.rand(1, 1, h // 128, w // 128) > 0.5).astype(np.float32)

    meta = {"inputs": torch.from_numpy(frame),
            "frame_state": torch.from_numpy(frame_state),
            "output_repr": torch.from_numpy(output_repr),
            "grid": torch.from_numpy(grid)}
    with torch.no_grad():
        ref_logits = tnet(meta).numpy()  # (1, 1, 2, 4)

    params, bn_state = convert_policy_state_dict(tnet.state_dict())
    x = net.assemble_policy_input(
        jnp.asarray(frame.transpose(0, 2, 3, 1)),
        jnp.asarray(frame_state.transpose(0, 2, 3, 1)),
        jnp.asarray(output_repr.transpose(0, 2, 3, 1)),
        jnp.asarray(grid[:, 0]), 128)
    ours, _ = net.policy_net_apply(params, bn_state, x, update_stats=False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    assert ours.shape == ref_logits.shape
    assert_close_normalized(ours, ref_logits, 1e-3, "policy-logits")


def test_full_reinforce_update_parity(monkeypatch):
    """End-to-end REINFORCE update parity: the reference's actual
    ``PolicyTrainRL.optim`` (information gain + running-cost EMA +
    signed-square complexity reward + max-pooled reward + Bernoulli
    log-prob loss + torch RMSprop) vs ours, from identical weights and the
    reference's own sampled grid.  Pins the whole reward/loss/optimizer
    wiring in one assertion."""
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
                                block_num_classes=19, block_size=128)
    torch.manual_seed(0)
    ref_pol = ref_policy_mod.build_policy_from_settings(settings)
    ref_pol.net.train()
    sd0 = {k: v.clone() for k, v in ref_pol.net.state_dict().items()}

    # >= 16 blocks so the reference's 1/16 count-quantization has a
    # non-zero multiple (policy.py:141 divides by int(total/16))
    h, w = 512, 1024
    rs = np.random.RandomState(5)
    frame = rs.randn(1, 3, h, w).astype(np.float32)
    frame_state = rs.randn(1, 3, h, w).astype(np.float32)
    outputs = (rs.randn(1, 19, h, w) * 2).astype(np.float32)
    outputs_prev = outputs + rs.randn(1, 19, h, w).astype(np.float32)
    prev_grid = np.ones((1, 1, h // 128, w // 128), np.float32)

    meta = {"inputs": torch.from_numpy(frame),
            "frame_state": torch.from_numpy(frame_state),
            "output_repr": torch.from_numpy(outputs_prev),
            "grid": torch.from_numpy(prev_grid),
            "outputs": torch.from_numpy(outputs),
            "outputs_prev": torch.from_numpy(outputs_prev)}
    import random as _pyrandom
    _pyrandom.seed(0)  # the reference count-quantization uses global random
    meta = ref_pol(meta)          # samples ITS grid, sets perc_exec
    sampled_grid = meta["grid"].numpy()[:, 0]  # (1, gh, gw) bool
    meta = ref_pol.optim(meta, train=True)
    sd1 = ref_pol.net.state_dict()

    # ours: same initial weights, same grid, same inputs
    params0, bn_state0 = convert_policy_state_dict(sd0)
    mine = my_build(settings)
    mine.net_params, mine.bn_state = params0, bn_state0
    mine.running_cost = None
    cache_x = net.assemble_policy_input(
        jnp.asarray(frame.transpose(0, 2, 3, 1)),
        jnp.asarray(frame_state.transpose(0, 2, 3, 1)),
        jnp.asarray(outputs_prev.transpose(0, 2, 3, 1)),
        jnp.asarray(prev_grid[:, 0]), 128)
    my_meta = {"inputs": jnp.asarray(frame.transpose(0, 2, 3, 1)),
               "outputs": jnp.asarray(outputs.transpose(0, 2, 3, 1)),
               "outputs_prev": jnp.asarray(outputs_prev.transpose(0, 2, 3, 1)),
               "grid": jnp.asarray(sampled_grid),
               "perc_exec": float(meta["perc_exec"]),
               "_rl_cache": cache_x}
    mine.optim(my_meta, train=True)

    assert abs(mine.running_cost - float(ref_pol.running_cost)) < 1e-6

    params1_ref, _ = convert_policy_state_dict(sd1)
    flat_new = jax.tree_util.tree_leaves_with_path(mine.net_params)
    ref_new = dict(jax.tree_util.tree_leaves_with_path(params1_ref))
    ref_old = dict(jax.tree_util.tree_leaves_with_path(params0))
    checked = 0
    for path, newv in flat_new:
        d_mine = np.asarray(newv) - np.asarray(ref_old[path])
        d_ref = np.asarray(ref_new[path]) - np.asarray(ref_old[path])
        assert np.abs(d_ref).max() > 0, f"reference did not update {path}"
        # atol ~3% of the RMSprop first-step magnitude lr/sqrt(1-a): where
        # a gradient is ~0, g/sqrt(g^2) is ill-conditioned and fp32 noise
        # across frameworks perturbs a few per-million elements
        np.testing.assert_allclose(d_mine, d_ref, rtol=5e-3, atol=3e-5,
                                   err_msg=str(path))
        checked += 1
    assert checked > 20  # every conv/bn tensor was compared


def test_policy_net_parity_default_bf16(ref_policy_net):
    """Same comparison at the production compute dtype (bf16 convs, fp32
    statistics): on an UNTRAINED net with train-mode BN, bf16 costs ~0.1
    normalized logit deviation — acceptable for a Bernoulli sampler (the
    REINFORCE convergence tests pin the behavioral property)."""
    import blockcopy_tpu.policy.net as net

    torch.manual_seed(0)
    tnet = ref_policy_net(block_size=128, task_num_classes=19)
    tnet.train()
    rs = np.random.RandomState(2)
    h, w = 256, 512
    frame = rs.randn(1, 3, h, w).astype(np.float32)
    meta = {"inputs": torch.from_numpy(frame),
            "frame_state": torch.from_numpy(frame),
            "output_repr": torch.from_numpy(
                rs.randn(1, 19, h // 4, w // 4).astype(np.float32)),
            "grid": torch.from_numpy(
                np.ones((1, 1, h // 128, w // 128), np.float32))}
    with torch.no_grad():
        ref_logits = tnet(meta).numpy()

    params, bn_state = convert_policy_state_dict(tnet.state_dict())
    x = net.assemble_policy_input(
        jnp.asarray(frame.transpose(0, 2, 3, 1)),
        jnp.asarray(frame.transpose(0, 2, 3, 1)),
        jnp.asarray(np.asarray(meta["output_repr"]).transpose(0, 2, 3, 1)),
        jnp.asarray(np.asarray(meta["grid"])[:, 0]), 128)
    ours, _ = net.policy_net_apply(params, bn_state, x, update_stats=False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    assert_close_normalized(ours, ref_logits, 2e-1, "policy-logits-bf16")
