"""Detection ops inherited from mmdetection that the reference ships as CUDA
extensions but that are off the BlockCopy target path (SURVEY.md §2.4):
sigmoid focal loss, RoIAlign and RoIPool, deformable convolution (v1/v2)
and masked conv, expressed directly in JAX (no native kernel needed on TPU;
nothing in the CSP/SwiftNet configs enables DCN — ``dcn=None`` — but the
backbone API accepts it, so the op is provided).

References: ``Pedestron/mmdet/ops/sigmoid_focal_loss/``, ``ops/roi_align/``,
``ops/roi_pool/``, ``ops/dcn/``, ``ops/masked_conv/`` (CUDA sources +
gradcheck scripts).
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
        # mmdet bilinear_interpolate: samples outside [-1, size] contribute
        # ZERO (not the clamped border value); inside, coords clamp to >= 0
        valid = (y >= -1.0) & (y <= h) & (x >= -1.0) & (x <= w)
        y = jnp.clip(y, 0.0, h - 1)
        x = jnp.clip(x, 0.0, w - 1)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1c = jnp.clip(y0 + 1, 0, h - 1)
        x1c = jnp.clip(x0 + 1, 0, w - 1)
        wy = (y - y0)[..., None]
        wx = (x - x0)[..., None]
        v00 = img[y0, x0]
        v01 = img[y0, x1c]
        v10 = img[y1c, x0]
        v11 = img[y1c, x1c]
        val = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
               + v10 * wy * (1 - wx) + v11 * wy * wx)
        return jnp.where(valid[..., None], val, 0.0)

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

    return jax.vmap(one_roi)(batch, ys, xs)


def _bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array
                     ) -> jax.Array:
    """Bilinear sample ``img (H, W, C)`` at float positions; out-of-bounds
    contributes zero (the DCN kernels' zero-padding semantics,
    ``mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu`` dmcn_im2col_bilinear)."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    out = 0.0
    for dy, wy in ((0, 1 - wy1), (1, wy1)):
        for dx, wx in ((0, 1 - wx1), (1, wx1)):
            yy = y0.astype(jnp.int32) + dy
            xx = x0.astype(jnp.int32) + dx
            inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            v = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
            out = out + v * (wy * wx * inb)[..., None]
    return out


def deform_conv2d(x: jax.Array, offsets: jax.Array, w: jax.Array,
                  b: jax.Array = None, stride: int = 1, padding: int = 1,
                  dilation: int = 1, deformable_groups: int = 1,
                  mask: jax.Array = None) -> jax.Array:
    """Deformable convolution, v1 (``mask=None``) and modulated v2.

    TPU-native equivalent of ``deform_conv_cuda`` / ``modulated_deform_conv``
    (``mmdet/ops/dcn``): per-tap bilinear sampling at learned offsets, then
    the contraction runs as one MXU matmul over the gathered taps.

    Args:
        x: (N, H, W, C) features.
        offsets: (N, Ho, Wo, dg*kh*kw*2), last dim interleaved (dy, dx) per
            tap in row-major tap order (torch layout).
        w: (kh, kw, C, Cout) HWIO weights.
        mask: optional (N, Ho, Wo, dg*kh*kw) modulation (DCNv2).
    Returns:
        (N, Ho, Wo, Cout).
    """
    n, h, wdt, c = x.shape
    kh, kw, _, cout = w.shape
    dg = deformable_groups
    assert c % dg == 0
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (wdt + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    off = offsets.reshape(n, ho, wo, dg, kh * kw, 2)
    base_y = (jnp.arange(ho) * stride - padding).astype(jnp.float32)
    base_x = (jnp.arange(wo) * stride - padding).astype(jnp.float32)

    def one_image(img, off_i, mask_i):
        taps = []
        for t in range(kh * kw):
            ky, kx = t // kw, t % kw
            ys = (base_y[:, None] + ky * dilation)[None] + off_i[:, :, :, t, 0].transpose(2, 0, 1)
            xs = (base_x[None, :] + kx * dilation)[None] + off_i[:, :, :, t, 1].transpose(2, 0, 1)
            # per deformable group: sample that group's channel slice
            per_g = []
            cg = c // dg
            for g in range(dg):
                v = _bilinear_sample(img[..., g * cg:(g + 1) * cg],
                                     ys[g], xs[g])
                if mask_i is not None:
                    v = v * mask_i[:, :, g, t][..., None]
                per_g.append(v)
            taps.append(jnp.concatenate(per_g, axis=-1))  # (ho, wo, c)
        stacked = jnp.stack(taps, axis=2)  # (ho, wo, kh*kw, c)
        wt = w.reshape(kh * kw, c, cout)
        return jnp.einsum("hwtc,tco->hwo", stacked, wt)

    if mask is None:
        out = jax.vmap(lambda img, o: one_image(img, o, None))(x, off)
    else:
        out = jax.vmap(one_image)(x, off,
                                  mask.reshape(n, ho, wo, dg, kh * kw))
    if b is not None:
        out = out + b
    return out


def masked_conv2d(ctx, name: str, x, w: jax.Array, mask: jax.Array,
                  b: jax.Array = None, stride: int = 1,
                  padding: int = 1) -> jax.Array:
    """``masked_conv2d_cuda`` parity (``mmdet/ops/masked_conv``): convolution
    whose output is only needed at masked pixels.

    The reference's kernel gathers an im2col matrix for the masked pixels to
    *save* compute on a GPU.  On the TPU MXU, per-pixel gather/scatter costs
    more than the dense convolution it would save (the whole framework's
    thesis is that per-*block* sparsity is the granularity that pays), so
    the op computes densely and applies the mask — semantics identical,
    honest about where the FLOPs go (the MAC tally counts the dense cost).
    """
    from blockcopy_tpu.ops.layers import conv2d

    out = conv2d(ctx, name, x, w, b, stride=stride, padding=padding)
    m = mask.astype(jnp.float32)
    if m.ndim == 3:
        m = m[..., None]
    from blockcopy_tpu.ops.layers import emap
    return emap(lambda d: d * m.astype(d.dtype), out)
