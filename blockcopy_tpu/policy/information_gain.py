"""Information-gain rewards for the REINFORCE policy.

Semantic segmentation: per-pixel KL divergence between the class
distributions of the current and previous frame outputs at 1/4 scale
(reference ``blockcopy/blockcopy/policy/information_gain.py:22-41``).

Object detection: IoU-based instance-mask gain between the box lists of
consecutive frames (reference ``information_gain.py:43-108``) — implemented
in ``blockcopy_tpu/tasks/detection`` where box decoding lives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from blockcopy_tpu.ops.layers import resize_bilinear


def semseg_output_repr(outputs: jax.Array) -> jax.Array:
    """Output representation for the policy net input: the raw logits
    (reference ``information_gain.py:27-30``)."""
    return outputs


def semseg_information_gain(
    outputs: jax.Array, outputs_prev: jax.Array, scale_factor: float = 0.25
) -> jax.Array:
    """KL(prev || cur) per pixel, channel-mean — (N, h, w, 1) float32.

    Matches ``F.kl_div(input=log_softmax(cur), target=log_softmax(prev),
    log_target=True)`` elementwise == exp(log q) * (log q - log p), then
    mean over classes (reference ``information_gain.py:32-41``).
    """
    n, h, w, c = outputs.shape
    oh, ow = int(h * scale_factor), int(w * scale_factor)
    cur = resize_bilinear(outputs.astype(jnp.float32), (oh, ow))
    prev = resize_bilinear(outputs_prev.astype(jnp.float32), (oh, ow))
    log_p = jax.nn.log_softmax(cur, axis=-1)
    log_q = jax.nn.log_softmax(prev, axis=-1)
    kl = jnp.exp(log_q) * (log_q - log_p)
    return kl.mean(axis=-1, keepdims=True)
