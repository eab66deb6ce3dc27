"""Policy network: CIFAR-style ResNet-8 trunk + 3-layer strided head.

Functional JAX port of the reference architecture
(``blockcopy/blockcopy/policy/net.py:17-125`` and
``blockcopy/blockcopy/policy/resnet.py:60-152``): input is the concatenation
of the 1/4-scale frame, frame-state composite, previous output representation
(-0.5) and previous grid (-0.5); output is one logit per block.

The net always runs in train mode (the reference asserts ``self.net.training``
at ``policy/policy.py:280``): BatchNorm normalizes with batch statistics and
maintains running stats (momentum 0.02) for checkpointing.

Precision: the reference keeps the whole policy in float32 while the task
model runs half precision (``test_swiftnet.py:119-123``) because *fp16*
training is range-unstable.  On TPU the idiomatic equivalent is mixed
precision: convolutions run in **bfloat16** (same exponent range as fp32)
with fp32 MXU accumulation, while parameters, BatchNorm statistics, gradients
and the RMSprop state all stay float32.  fp32 convolutions on the TPU MXU
decompose into multiple bf16 passes, so this is ~3x faster at equivalent
training stability.  Set ``BLOCKCOPY_TPU_POLICY_COMPUTE=fp32`` to force
full-fp32 compute (numerics debugging).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp

from blockcopy_tpu.ops.layers import resize_nearest

BN_MOMENTUM = 0.02
BN_EPS = 1e-5
COMPUTE_DTYPE = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[
    os.environ.get("BLOCKCOPY_TPU_POLICY_COMPUTE", "bf16")]


# ---------------------------------------------------------------------------
# parameter initialization
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, bias=False):
    # normal(0, sqrt(2/n)) with n = kh*kw*cout — the reference's scheme
    # (policy/resnet.py:141-147 via modules() init loop)
    n = kh * kw * cout
    p = {"w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
         * jnp.sqrt(2.0 / n)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _bn_init(c):
    return {"gamma": jnp.ones((c,), jnp.float32),
            "beta": jnp.zeros((c,), jnp.float32)}


def _bn_state_init(c):
    return {"mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32)}


def _basic_block_init(key, cin, cout, stride):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": _conv_init(ks[0], 3, 3, cin, cout),
        "bn1": _bn_init(cout),
        "conv2": _conv_init(ks[1], 3, 3, cout, cout),
        "bn2": _bn_init(cout),
    }
    s = {"bn1": _bn_state_init(cout), "bn2": _bn_state_init(cout)}
    if stride != 1 or cin != cout:
        p["down_conv"] = _conv_init(ks[2], 1, 1, cin, cout)
        p["down_bn"] = _bn_init(cout)
        s["down_bn"] = _bn_state_init(cout)
    return p, s


S2D = 4  # space-to-depth factor of the "fast" arch stem

# Lower the fast-arch stem as one k=4 stride-4 conv instead of an explicit
# space-to-depth transpose + 1x1 conv.  Mathematically identical (the s2d
# channel order (sub_row, sub_col, c) unflattens to the conv's (kh, kw, c)
# window exactly), but the device profile (tools/profile_top.py) shows the
# materialized s2d transposes of the 26-channel assembled input cost
# ~0.2 ms/frame of pure data formatting that a strided conv's internal
# im2col avoids.  Params stay (1, 1, 16C, width) for checkpoint/optimizer
# compatibility; the reshape happens at trace time.
POLICY_STEM_CONV4 = os.environ.get(
    "BLOCKCOPY_TPU_POLICY_STEM_CONV4", "1") == "1"

# Split-stem lowering for the fast arch: keep the four policy-input sources
# (frame, frame_state, output_repr, prev_grid) SEPARATE and compute the k4s4
# stem conv as a sum of per-source convs — conv is linear in its input, so
# conv(concat(a,b,c,d), W) == sum_i conv(x_i, W_i) exactly.  The -0.5 offsets
# on output_repr/prev_grid fold into a per-channel constant (0.5 * sum of the
# group's taps), and the prev_grid term needs no conv at all: every 4x4
# stride-4 window lies inside one constant 32x32 grid cell (4i mod 32 is a
# multiple of 4, so 4i..4i+3 never crosses a cell edge), making its
# contribution (g - 0.5) * sum_taps broadcast 8x8 per cell.  Motivation (r4
# device trace, tools/profile_top.py): the materialized 26-ch concat costs a
# ~0.107 ms/frame [256,1,8,64,26] formatting copy feeding the stem conv,
# plus per-train-frame copies of the cached concat — bytes the per-source
# form never builds.  Decided by full-program A/B (tools/ab_flag.py).
POLICY_SPLIT_STEM = os.environ.get(
    "BLOCKCOPY_TPU_POLICY_SPLIT_STEM", "0") == "1"


def _space_to_depth(x, r: int):
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // r, w // r, r * r * c)


def _init_policy_net_fast(key, in_channels: int, width: int = 128,
                          head_bias: float = 0.0):
    """TPU-native policy trunk (``arch='fast'``): a space-to-depth-4 stem
    moves ALL convolution to 1/16 of the input positions with 4x the
    channels.  Same FLOP budget as the reference arch but ~4x fewer
    activation bytes and MXU-sized channel counts — the policy step is
    HBM-bandwidth-bound, not FLOP-bound, so this is the lever that matters
    (see docs/NEXT_ROUND.md bisection: stride-1 32-channel convs at 256x512
    dominate the REINFORCE cost).  Output stride stays /32 overall
    (s2d/4 * block2/2 * head0/2 * head1/2), so logits land exactly on the
    block grid like the reference arch."""
    c0 = in_channels * S2D * S2D
    c1, c2 = width, 2 * width
    ks = jax.random.split(key, 5)
    params: Dict = {"stem": _conv_init(ks[0], 1, 1, c0, c1),
                    "stem_bn": _bn_init(c1)}
    bn_state: Dict = {"stem_bn": _bn_state_init(c1)}
    params["block1"], bn_state["block1"] = _basic_block_init(ks[1], c1, c1, 1)
    params["block2"], bn_state["block2"] = _basic_block_init(ks[2], c1, c2, 2)
    params["head0"] = _conv_init(ks[3], 3, 3, c2, c2)
    params["head0_bn"] = _bn_init(c2)
    bn_state["head0_bn"] = _bn_state_init(c2)
    # zero-init the logit head WEIGHTS: initial probs are spatially uniform.
    # The reference init (normal, fan-out 9) makes initial logits huge and
    # input-correlated; under the early complexity crush that bakes in a
    # spatially-biased policy the information gain then has to unlearn
    # (measured: bright moving regions started at prob 0.06 and needed
    # hundreds of frames to recover).  A zero head is the standard RL
    # policy-head init and removes the transient entirely.
    #
    # The BIAS starts at logit(block_target) rather than 0 (r5): with a zero
    # bias the initial exec prob is 0.5 everywhere, so at low targets the
    # signed-square complexity reward spends the first hundreds of updates
    # uniformly crushing every logit toward the target — a gradient that
    # swamps the (sparse) information-gain signal, which is the window where
    # the reference arch learns localization.  Starting at the target makes
    # the crush term ~0 from the outset so the IG gradient shapes spatial
    # preference immediately.  At target 0.5 the bias is exactly 0 — the
    # pre-r5 behavior (and the headline bench operating point) is unchanged.
    # Measured at t=0.25/amp-6 (VALIDATION_fast_t025_amp6.json history):
    # see docs/COVERAGE.md quality-frontier table.
    params["head1"] = {"w": jnp.zeros((3, 3, c2, 1), jnp.float32),
                       "b": jnp.full((1,), head_bias, jnp.float32)}
    return params, bn_state


def init_policy_net(key, in_channels: int, width_factor: int = 2,
                    arch: str = "ref", head_bias: float = 0.0):
    """ResNet-8 ([1,1,1] BasicBlocks) trunk + head.  Returns (params, bn_state).

    ``arch='ref'`` is the reference architecture (parity-tested against the
    torch PolicyNet); ``arch='fast'`` is the TPU-native space-to-depth trunk
    (same reward/update machinery, ~3x cheaper in bytes).  ``head_bias``
    (fast arch only) initializes the logit-head bias — callers pass
    logit(block_target) so initial sampling starts at the execution target
    instead of 0.5; the ref arch ignores it (reference-init parity)."""
    if arch == "fast":
        return _init_policy_net_fast(key, in_channels, head_bias=head_bias)
    assert arch == "ref", arch
    w = width_factor
    c1, c2, c3 = 16 * w, 32 * w, 64 * w
    ks = jax.random.split(key, 8)
    params: Dict = {"conv1": _conv_init(ks[0], 3, 3, in_channels, c1),
                    "bn1": _bn_init(c1)}
    bn_state: Dict = {"bn1": _bn_state_init(c1)}
    for i, (cin, cout, stride) in enumerate(
        [(c1, c1, 1), (c1, c2, 2), (c2, c3, 2)]
    ):
        p, s = _basic_block_init(ks[1 + i], cin, cout, stride)
        params[f"layer{i + 1}"] = p
        bn_state[f"layer{i + 1}"] = s
    # head: conv3x3 s2 + BN + ReLU, twice, then conv3x3 s2 -> 1 logit (bias)
    planes = 128
    params["head0"] = _conv_init(ks[4], 3, 3, c3, planes)
    params["head0_bn"] = _bn_init(planes)
    bn_state["head0_bn"] = _bn_state_init(planes)
    params["head1"] = _conv_init(ks[5], 3, 3, planes, planes)
    params["head1_bn"] = _bn_init(planes)
    bn_state["head1_bn"] = _bn_state_init(planes)
    params["head2"] = _conv_init(ks[6], 3, 3, planes, 1, bias=True)
    return params, bn_state


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _conv(x, p, stride=1):
    # bf16 in/out (the TPU MXU accumulates in fp32 internally either way;
    # an explicit fp32 preferred_element_type would break the conv transpose
    # rule under jax.grad with mixed dtypes), then upcast for the fp32
    # BatchNorm statistics.
    out = jax.lax.conv_general_dilated(
        x.astype(COMPUTE_DTYPE), p["w"].astype(COMPUTE_DTYPE),
        window_strides=(stride, stride),
        padding=[(1, 1), (1, 1)] if p["w"].shape[0] == 3 else [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.astype(jnp.float32) + (p["b"] if "b" in p else 0.0)


def _bn_train(x, p, s, update_stats: bool):
    """Train-mode BatchNorm: normalize with batch stats; optionally update
    running stats (torch: biased var for normalization, unbiased for the
    running update)."""
    axes = (0, 1, 2)
    mean = x.mean(axes)
    var = x.var(axes)
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * p["gamma"] + p["beta"]
    if update_stats:
        count = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * count / max(count - 1, 1)
        s = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
    return y, s


def _basic_block(x, p, s, stride, update_stats):
    identity = x
    if "down_conv" in p:
        identity = _conv(x, p["down_conv"], stride)
        identity, s["down_bn"] = _bn_train(identity, p["down_bn"], s["down_bn"], update_stats)
    out = _conv(x, p["conv1"], stride)
    out, s["bn1"] = _bn_train(out, p["bn1"], s["bn1"], update_stats)
    out = jnp.maximum(out, 0)
    out = _conv(out, p["conv2"], 1)
    out, s["bn2"] = _bn_train(out, p["bn2"], s["bn2"], update_stats)
    out = out + identity
    return jnp.maximum(out, 0), s


def _conv_stem4(x, p):
    """k=4 stride-4 VALID conv == space-to-depth-4 + 1x1 conv with the same
    weights: ``w[(sr, sc, c), o] -> w4[sr, sc, c, o]`` (see
    POLICY_STEM_CONV4)."""
    c_in = x.shape[-1]
    w4 = p["w"].reshape(S2D, S2D, c_in, p["w"].shape[-1])
    out = jax.lax.conv_general_dilated(
        x.astype(COMPUTE_DTYPE), w4.astype(COMPUTE_DTYPE),
        window_strides=(S2D, S2D), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out.astype(jnp.float32)


def _conv_stem4_split(xs, p):
    """Split-stem form of ``_conv_stem4`` (see POLICY_SPLIT_STEM): ``xs`` is
    the (frame, frame_state, output_repr, prev_grid) tuple from
    ``assemble_policy_input(..., split=True)`` — sources UNoffset, prev_grid
    at grid resolution.  Exactly conv4s4(concat with -0.5 offsets) up to
    fp summation order."""
    frame_q, fs_q, out_q, grid = xs
    c_f, c_s, c_o = frame_q.shape[-1], fs_q.shape[-1], out_q.shape[-1]
    c_in = c_f + c_s + c_o + 1
    w4 = p["w"].reshape(S2D, S2D, c_in, p["w"].shape[-1])
    w4 = w4.astype(COMPUTE_DTYPE)

    def part(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(COMPUTE_DTYPE), w,
            window_strides=(S2D, S2D), padding=[(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)

    y = part(frame_q, w4[:, :, :c_f])
    y = y + part(fs_q, w4[:, :, c_f:c_f + c_s])
    y = y + part(out_q, w4[:, :, c_f + c_s:c_f + c_s + c_o])
    # -0.5 offset on output_repr: constant per output channel
    w_out32 = w4[:, :, c_f + c_s:c_f + c_s + c_o].astype(jnp.float32)
    y = y - 0.5 * w_out32.sum(axis=(0, 1, 2))
    # prev_grid: constant within every 4x4 window -> analytic contribution,
    # broadcast 8x8 per grid cell (cells are 32 px at policy-input scale)
    gsum = w4[:, :, c_f + c_s + c_o].astype(jnp.float32).sum(axis=(0, 1))
    gterm = (grid.astype(jnp.float32) - 0.5)[..., None] * gsum
    n, gh, gw, co = gterm.shape
    # the 8x8 per-cell broadcast assumes the stem output has exactly 8
    # positions per grid cell (policy-input scale 32 px/block / S2D=4);
    # fail loudly if the geometry ever drifts (advisor finding r4)
    assert y.shape[1:3] == (gh * 8, gw * 8), (
        f"split-stem geometry mismatch: stem out {y.shape[1:3]} vs grid "
        f"{(gh, gw)} * 8 — h/w not divisible by block_size, or a scale "
        "change broke the 8-positions-per-cell assumption")
    gterm = jnp.broadcast_to(gterm[:, :, None, :, None, :],
                             (n, gh, 8, gw, 8, co))
    return y + gterm.reshape(n, gh * 8, gw * 8, co)


def _policy_net_fast_apply(params, bn_state, x, update_stats: bool):
    s = jax.tree.map(lambda a: a, bn_state)  # shallow copy
    if isinstance(x, tuple):
        x = _conv_stem4_split(x, params["stem"])
    elif POLICY_STEM_CONV4:
        x = _conv_stem4(x, params["stem"])
    else:
        x = _space_to_depth(x, S2D)
        x = _conv(x, params["stem"], 1)
    x, s["stem_bn"] = _bn_train(x, params["stem_bn"], s["stem_bn"],
                                update_stats)
    x = jnp.maximum(x, 0)
    x, s["block1"] = _basic_block(x, params["block1"], s["block1"], 1,
                                  update_stats)
    x, s["block2"] = _basic_block(x, params["block2"], s["block2"], 2,
                                  update_stats)
    x = _conv(x, params["head0"], 2)
    x, s["head0_bn"] = _bn_train(x, params["head0_bn"], s["head0_bn"],
                                 update_stats)
    x = jnp.maximum(x, 0)
    logits = _conv(x, params["head1"], 2)
    return logits, s


def policy_net_apply(params, bn_state, x, update_stats: bool = True,
                     arch: str = "ref"):
    """x: (N, H/4, W/4, Cin) float32 -> logits (N, H/bs, W/bs, 1).

    ``update_stats=False`` is used when the forward is re-traced inside the
    REINFORCE loss (gradients flow through this apply; running stats must not
    double-update)."""
    if arch == "fast":
        return _policy_net_fast_apply(params, bn_state, x, update_stats)
    assert arch == "ref", arch
    s = jax.tree.map(lambda a: a, bn_state)  # shallow copy
    x = _conv(x, params["conv1"], 1)
    x, s["bn1"] = _bn_train(x, params["bn1"], s["bn1"], update_stats)
    x = jnp.maximum(x, 0)
    for i, stride in enumerate([1, 2, 2]):
        x, s[f"layer{i + 1}"] = _basic_block(
            x, params[f"layer{i + 1}"], s[f"layer{i + 1}"], stride, update_stats
        )
    x = _conv(x, params["head0"], 2)
    x, s["head0_bn"] = _bn_train(x, params["head0_bn"], s["head0_bn"], update_stats)
    x = jnp.maximum(x, 0)
    x = _conv(x, params["head1"], 2)
    x, s["head1_bn"] = _bn_train(x, params["head1_bn"], s["head1_bn"], update_stats)
    x = jnp.maximum(x, 0)
    logits = _conv(x, params["head2"], 2)
    return logits, s


def assemble_policy_input(
    frame: jax.Array,
    frame_state: jax.Array,
    output_repr: jax.Array,
    prev_grid: jax.Array,
    block_size: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Build the policy net input at 1/4 * (128/block_size) scale
    (reference ``policy/net.py:78-113``): nearest-resized frame ++ frame_state
    ++ (output_repr - 0.5) ++ (prev_grid - 0.5).

    ``dtype``: fp32 for the reference arch (parity); the fast arch passes
    bfloat16 — its convs run bf16 anyway, and halving the assembled-input
    bytes also halves the space-to-depth transpose traffic."""
    n, h, w, _ = frame.shape
    scale = 0.25 * 128 / block_size
    oh, ow = int(h * scale), int(w * scale)
    feats = [
        resize_nearest(frame.astype(dtype), (oh, ow)),
        resize_nearest(frame_state.astype(dtype), (oh, ow)),
        resize_nearest(output_repr.astype(dtype), (oh, ow)) - jnp.asarray(
            0.5, dtype),
        resize_nearest(
            prev_grid.astype(dtype)[..., None], (oh, ow)
        ) - jnp.asarray(0.5, dtype),
    ]
    return jax.lax.stop_gradient(jnp.concatenate(feats, axis=-1))


def assemble_policy_input_split(
    frame: jax.Array,
    frame_state: jax.Array,
    output_repr: jax.Array,
    prev_grid: jax.Array,
    block_size: int,
    dtype=jnp.bfloat16,
):
    """Split-stem variant of ``assemble_policy_input`` (POLICY_SPLIT_STEM,
    fast arch + conv4 stem only): returns the four sources as a tuple —
    resized but UNconcatenated and UNoffset (offsets fold into the stem
    conv, see ``_conv_stem4_split``); ``prev_grid`` stays at grid
    resolution.  The 26-ch concat canvas and its stem-feeding layout copy
    are never materialized."""
    n, h, w, _ = frame.shape
    scale = 0.25 * 128 / block_size
    oh, ow = int(h * scale), int(w * scale)
    sg = jax.lax.stop_gradient
    return (
        sg(resize_nearest(frame.astype(dtype), (oh, ow))),
        sg(resize_nearest(frame_state.astype(dtype), (oh, ow))),
        sg(resize_nearest(output_repr.astype(dtype), (oh, ow))),
        sg(prev_grid),
    )


def policy_in_channels(num_classes: int) -> int:
    return 3 + 3 + num_classes + 1
