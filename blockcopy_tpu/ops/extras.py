"""Detection ops inherited from mmdetection that the reference ships as CUDA
extensions but that are off the BlockCopy target path (SURVEY.md §2.4):
sigmoid focal loss, RoIAlign and RoIPool, expressed directly in JAX (no
native kernel needed on TPU).  Deformable convolution is a documented
non-goal (nothing in the CSP/SwiftNet configs uses it; ``dcn=None``).

References: ``Pedestron/mmdet/ops/sigmoid_focal_loss/``, ``ops/roi_align/``,
``ops/roi_pool/`` (CUDA sources + gradcheck scripts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jax.Array, targets: jax.Array,
                       gamma: float = 2.0, alpha: float = 0.25) -> jax.Array:
    """Per-element sigmoid focal loss (CUDA ext parity: targets are 1-based
    class indices, 0 = background; logits (N, C) over foreground classes)."""
    n, c = logits.shape
    class_range = jnp.arange(1, c + 1)[None, :]
    t = (targets[:, None] == class_range).astype(logits.dtype)
    p = jax.nn.sigmoid(logits)
    term_pos = (1 - p) ** gamma * jax.nn.log_sigmoid(logits)
    term_neg = p ** gamma * jax.nn.log_sigmoid(-logits)
    loss = -(t * term_pos * alpha + (1 - t) * term_neg * (1 - alpha))
    return loss


def _roi_grid(rois, out_size, spatial_scale, sampling_ratio):
    """Sample coordinates for RoIAlign: (R, out, out, s, s, 2)."""
    s = sampling_ratio
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale
    rw = jnp.maximum(x2 - x1, 1.0)
    rh = jnp.maximum(y2 - y1, 1.0)
    bin_w = rw / out_size
    bin_h = rh / out_size
    ob = jnp.arange(out_size, dtype=jnp.float32)
    sb = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    # sample position = roi_start + (bin_index + sub_bin_center) * bin_size
    off = ob[None, :, None] + sb[None, None, :]          # (1, out, s)
    ys = y1[:, None, None] + off * bin_h[:, None, None]  # (R, out, s)
    xs = x1[:, None, None] + off * bin_w[:, None, None]
    return ys, xs


def roi_align(features: jax.Array, rois: jax.Array, out_size: int = 7,
              spatial_scale: float = 1.0,
              sampling_ratio: int = 2) -> jax.Array:
    """RoIAlign (bilinear-sampled average pooling per RoI bin).

    features: (N, H, W, C); rois: (R, 5) [batch_idx, x1, y1, x2, y2] in
    input pixels.  Returns (R, out_size, out_size, C).  JAX replacement for
    ``mmdet/ops/roi_align`` CUDA.
    """
    n, h, w, c = features.shape
    ys, xs = _roi_grid(rois, out_size, spatial_scale, sampling_ratio)
    batch = rois[:, 0].astype(jnp.int32)

    def sample(img, y, x):
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
        y1c = jnp.clip(y0 + 1, 0, h - 1)
        x1c = jnp.clip(x0 + 1, 0, w - 1)
        wy = jnp.clip(y - y0, 0, 1)[..., None]
        wx = jnp.clip(x - x0, 0, 1)[..., None]
        v00 = img[y0, x0]
        v01 = img[y0, x1c]
        v10 = img[y1c, x0]
        v11 = img[y1c, x1c]
        return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
                + v10 * wy * (1 - wx) + v11 * wy * wx)

    def one_roi(b, y_r, x_r):
        img = features[b]
        # (out, s) x (out, s) -> (out, out, s, s)
        yy = y_r[:, None, :, None]
        xx = x_r[None, :, None, :]
        yy = jnp.broadcast_to(yy, (out_size, out_size,
                                   y_r.shape[1], x_r.shape[1]))
        xx = jnp.broadcast_to(xx, yy.shape)
        vals = sample(img, yy, xx)  # (out, out, s, s, C)
        return vals.mean(axis=(2, 3))

    return jax.vmap(one_roi)(batch, ys, xs)


def roi_pool(features: jax.Array, rois: jax.Array, out_size: int = 7,
             spatial_scale: float = 1.0) -> jax.Array:
    """RoIPool (max pooling per quantized RoI bin) — ``mmdet/ops/roi_pool``
    parity; fixed 4-sample max approximation of the quantized bins keeps the
    shapes static."""
    aligned = roi_align(features, rois, out_size, spatial_scale,
                        sampling_ratio=2)
    # max over the sampling grid rather than mean: redo with max reduction
    n, h, w, c = features.shape
    ys, xs = _roi_grid(rois, out_size, spatial_scale, 2)
    batch = rois[:, 0].astype(jnp.int32)

    def one_roi(b, y_r, x_r):
        img = features[b]
        y0 = jnp.clip(jnp.round(y_r).astype(jnp.int32), 0, h - 1)
        x0 = jnp.clip(jnp.round(x_r).astype(jnp.int32), 0, w - 1)
        yy = jnp.broadcast_to(y0[:, None, :, None],
                              (out_size, out_size, y0.shape[1], x0.shape[1]))
        xx = jnp.broadcast_to(x0[None, :, None, :], yy.shape)
        vals = img[yy, xx]  # (out, out, s, s, C)
        return vals.max(axis=(2, 3))

    del aligned
    return jax.vmap(one_roi)(batch, ys, xs)
