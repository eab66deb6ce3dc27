"""Fused bottleneck-tail Pallas kernel: halo assembly + 3x3 conv + BN/ReLU +
1x1 conv + residual in ONE kernel.

For a stride-1 identity ResNet bottleneck the XLA lowering runs ~15 ops per
block (strip gathers, border-correction dots, two convs, BN/ReLU epilogues,
residual add), each with its own relayout/prologue cost — the dominant
residual cost of the blocked backbone once halo materialization is gone.
This kernel runs the whole tail per executed block inside VMEM:

    full    = concat(top row | left col + h1 tile + right col | bottom row)
    h2      = relu(bn2(conv3x3(full, w2)))        # 9 tap matmuls, fp32 acc
    y       = relu(bn3(h2 @ w3) + x_tile)         # 1x1 conv + residual

Halo strips are gathered on the XLA side (``core/blocked.py:
gather_halo_strips`` — small tensors, same temporal strip canvases the XLA
path maintains, so executed neighbors contribute same-frame values, the
reference's transfer+repad source selection, ``blockcopy/blockcopy/utils/
blockpad.py:108-146``) and pipelined into VMEM as ordinary block inputs;
the padded tile is assembled with register-level concats.  Mosaic's sliced
copies require 8-aligned sublane and 128-aligned lane extents (measured:
width-1 corner DMAs are rejected with "Slice shape along dimension 2 must
be aligned to tiling (8)"), which value-level ops are not subject to —
that is why assembly happens on loaded values, not refs.

Numerics mirror the XLA path exactly: fp32 matmul accumulation, BN/ReLU in
the activation dtype.  Lane tiling still wants the channel dim a multiple
of 128, so eligibility is gated on ``c_mid % 128 == 0`` (RN50 layers 2-4;
layer1's 64-channel 3x3 stays on the XLA border-correction path).  Non-TPU
backends run in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu" or \
            jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _kernel(h1_ref, x_ref, top_ref, bot_ref, left_ref, right_ref,
            w2_ref, w3_ref, s2_ref, b2_ref, s3_ref, b3_ref, y_ref, *,
            bs: int, chunk: int):
    dt = h1_ref.dtype
    c_mid = w2_ref.shape[2]
    c_out = w3_ref.shape[1]
    rows_flat = chunk * bs * bs

    # assemble the padded tile from VALUES (register-level concats carry no
    # sliced-copy alignment constraints)
    mid = jnp.concatenate(
        [left_ref[...][:, :, None, :], h1_ref[...],
         right_ref[...][:, :, None, :]], axis=2)       # (chunk, bs, bs+2, C)
    full = jnp.concatenate(
        [top_ref[...][:, None], mid, bot_ref[...][:, None]],
        axis=1)                                        # (chunk, bs+2, bs+2, C)

    # im2col along HEIGHT once (dim 1 is untiled, so the three dy-shifted
    # operands share a layout — Mosaic rejects channel concats of
    # sublane-shifted values with "offset mismatch on non-concat
    # dimension"), then one wide matmul per dx.  9 per-tap extractions were
    # measured relayout-bound at the full-program level.
    vert = jnp.concatenate(
        [full[:, dy:dy + bs] for dy in range(3)],
        axis=-1)                                       # (chunk, bs, bs+2, 3C)
    acc = jnp.zeros((rows_flat, c_mid), jnp.float32)
    for dx in range(3):
        xs = vert[:, :, dx:dx + bs, :]                 # (chunk, bs, bs, 3C)
        acc += jnp.dot(xs.reshape(rows_flat, 3 * c_mid), w2_ref[dx],
                       preferred_element_type=jnp.float32)
    # XLA-path numerics: cast the fp32 conv accumulator to the activation
    # dtype BEFORE the BN affine + ReLU (ops/layers.py conv2d/batch_norm)
    h2 = acc.astype(dt) * s2_ref[0].astype(dt) + b2_ref[0].astype(dt)
    h2 = jnp.maximum(h2, 0)

    y = jnp.dot(h2, w3_ref[...], preferred_element_type=jnp.float32)
    y = y.astype(dt) * s3_ref[0].astype(dt) + b3_ref[0].astype(dt)
    y = y + x_ref[...].reshape(rows_flat, c_out)
    y = jnp.maximum(y, 0)
    y_ref[...] = y.reshape(chunk, bs, bs, c_out)


def bottleneck_tail(h1, x, pieces, w2, s2, b2, w3, s3, b3):
    """Fused tail y = relu(bn3(conv1x1(relu(bn2(conv3x3_halo(h1))))) + x).

    ``h1``: (K, bs, bs, Cm) post-conv1 activations; ``x``: (K, bs, bs, Co)
    identity; ``pieces``: the 8 halo pieces from ``gather_halo_strips`` at
    pad 1; ``w2``: (3, 3, Cm, Cm); ``w3``: (Cm, Co); BN params are (C,)
    folded scale/bias.
    """
    k, bs, _, c_mid = h1.shape
    c_out = x.shape[-1]
    dt = h1.dtype
    cast = lambda piece: piece.astype(dt)
    # full-width halo rows (corners folded in, so every kernel operand has
    # clean (sublane, lane) = (bs[+2], C) tiling)
    top = jnp.concatenate(
        [cast(pieces["top_left"]), cast(pieces["top"]),
         cast(pieces["top_right"])], axis=2)[:, 0]     # (K, bs+2, C)
    bot = jnp.concatenate(
        [cast(pieces["bottom_left"]), cast(pieces["bottom"]),
         cast(pieces["bottom_right"])], axis=2)[:, 0]  # (K, bs+2, C)
    left = cast(pieces["left"])[:, :, 0]               # (K, bs, C)
    right = cast(pieces["right"])[:, :, 0]             # (K, bs, C)

    # Grid-step sizing: per-step overhead (semaphores, pipeline turnaround)
    # dominates when each step is one tiny block — target ~2048 matmul rows
    # per step within a ~6 MB VMEM working-set budget.
    itemsize = jnp.dtype(dt).itemsize
    bytes_per_block = itemsize * bs * bs * (6 * c_mid + 2 * c_out)
    chunk = max(1, min(2048 // (bs * bs), 6_000_000 // bytes_per_block, k))
    while k % chunk:
        chunk -= 1

    def index2(i, *_):
        return (i, 0, 0)

    def index3(i, *_):
        return (i, 0, 0, 0)

    grid_spec = pl.GridSpec(
        grid=(k // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, bs, bs, c_mid), index3,
                         memory_space=pltpu.VMEM),       # h1
            pl.BlockSpec((chunk, bs, bs, c_out), index3,
                         memory_space=pltpu.VMEM),       # x (identity)
            pl.BlockSpec((chunk, bs + 2, c_mid), index2,
                         memory_space=pltpu.VMEM),       # top row
            pl.BlockSpec((chunk, bs + 2, c_mid), index2,
                         memory_space=pltpu.VMEM),       # bottom row
            pl.BlockSpec((chunk, bs, c_mid), index2,
                         memory_space=pltpu.VMEM),       # left col
            pl.BlockSpec((chunk, bs, c_mid), index2,
                         memory_space=pltpu.VMEM),       # right col
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),       # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),       # s2
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),       # s3
            pl.BlockSpec(memory_space=pltpu.VMEM),       # b3
        ],
        out_specs=pl.BlockSpec((chunk, bs, bs, c_out), index3,
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, bs=bs, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, bs, bs, c_out), dt),
        interpret=not _is_tpu(),
    )(h1, x.astype(dt), top, bot, left, right,
      w2.astype(dt).transpose(1, 0, 2, 3).reshape(3, 3 * c_mid, c_mid),
      w3.astype(dt),
      s2.reshape(1, -1), b2.reshape(1, -1),
      s3.reshape(1, -1), b3.reshape(1, -1))
