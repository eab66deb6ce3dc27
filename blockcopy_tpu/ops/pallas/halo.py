"""Fused halo-assembly Pallas kernel.

One kernel assembles each executed block's padded ``(bs+2p, bs+2p, C)`` input
directly in VMEM: the interior comes from the already-resident packed block,
and the 8 halo strips are DMA'd straight from the neighbor rows of the HBM
feature canvas — replacing the XLA lowering's 9 gathers + 3 concatenates
(and the reference's transfer+repad CUDA kernel pair,
``blockcopy/blockcopy/utils/blockpad.py:77-156``).

Out-of-image neighbors are pre-encoded as the canvas's zero sentinel row, so
border zero-padding is the same DMA with no control flow.

Select with ``BLOCKCOPY_TPU_HALO=pallas`` (default: XLA lowering).  On
non-TPU backends the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu" or \
            jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _kernel(idx_ref, nbr_ref, center_ref, canvas_ref, out_ref, sems, *,
            bs: int, p: int):
    k = pl.program_id(0)
    # interior: straight from the packed block already in VMEM
    out_ref[0, p:p + bs, p:p + bs, :] = center_ref[0]

    tl, t, tr, l, r, bl, b, br = (nbr_ref[k, i] for i in range(8))

    copies = (
        # (src slice of canvas row, dst slice of out), one DMA each
        (canvas_ref.at[t, bs - p:bs, :, :], out_ref.at[0, 0:p, p:p + bs, :]),
        (canvas_ref.at[b, 0:p, :, :],
         out_ref.at[0, p + bs:p + bs + p, p:p + bs, :]),
        (canvas_ref.at[l, :, bs - p:bs, :], out_ref.at[0, p:p + bs, 0:p, :]),
        (canvas_ref.at[r, :, 0:p, :],
         out_ref.at[0, p:p + bs, p + bs:p + bs + p, :]),
        (canvas_ref.at[tl, bs - p:bs, bs - p:bs, :],
         out_ref.at[0, 0:p, 0:p, :]),
        (canvas_ref.at[tr, bs - p:bs, 0:p, :],
         out_ref.at[0, 0:p, p + bs:p + bs + p, :]),
        (canvas_ref.at[bl, 0:p, bs - p:bs, :],
         out_ref.at[0, p + bs:p + bs + p, 0:p, :]),
        (canvas_ref.at[br, 0:p, 0:p, :],
         out_ref.at[0, p + bs:p + bs + p, p + bs:p + bs + p, :]),
    )
    dmas = []
    for i, (src, dst) in enumerate(copies):
        dma = pltpu.make_async_copy(src, dst, sems.at[i])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def halo_gather_pallas(canvas, idx, pad, n, gh, gw, center):
    """Same contract as ``core.blocked.halo_gather`` (with center)."""
    from blockcopy_tpu.core import grid as gridlib

    p = int(pad)
    k, bs, _, c = center.shape
    nbr = gridlib.neighbor_indices(idx, n, gh, gw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, bs, bs, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # canvas stays in HBM
        ],
        out_specs=pl.BlockSpec((1, bs + 2 * p, bs + 2 * p, c),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
    )
    # output dtype follows the CANVAS (the XLA halo_gather contract): the
    # kernel's stores and canvas DMAs all run in canvas.dtype, so the
    # out_shape must too — declaring center.dtype would mismatch whenever
    # a caller passes a differently-typed center
    return pl.pallas_call(
        functools.partial(_kernel, bs=bs, p=p),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, bs + 2 * p, bs + 2 * p, c),
                                       canvas.dtype),
        interpret=not _is_tpu(),
    )(idx, nbr, center.astype(canvas.dtype), canvas)
