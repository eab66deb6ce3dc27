"""Block-sparse tensor representation and canvas exchange primitives.

This module replaces the reference's CUDA kernels and ``TensorWrapper``
machinery with three static-shape XLA primitives:

* ``split_dense``      — dense image -> packed executed blocks
  (reference ``utils/block_funcs.py:10-83`` ``split_kernel``)
* ``scatter_pack``     — packed blocks -> persistent block-layout canvas
  (reference ``utils/block_funcs.py:85-158`` ``combine_kernel``; the canvas
  *is* the previous frame's combined output, so the reference's
  clone-previous-output step disappears)
* ``halo_gather``      — gather padded ``(bs+2p, bs+2p)`` blocks from a
  canvas, halo pixels coming from the 4/8 spatial neighbors — fresh values if
  the neighbor executed this frame (it was just scattered), previous-frame
  values otherwise, zeros at true image borders.  This one primitive replaces
  the reference's ``transfer_kernel`` (``block_funcs.py:161-237``) +
  ``repad_kernel`` (``blockpad.py:77-156``) pair and the per-layer FIFO deques
  of ``BlockFeatures`` (``core/tensorwrapper.py:131-232``): the per-layer
  canvas is the "latest known features" union that those FIFOs maintained
  implicitly.

Canvas layout: ``(N*GH*GW + 1, bs, bs, C)`` NHWC-per-block — block-major so a
scatter/gather is a contiguous row copy, channels in lanes for the TPU's
(8,128) vector tiles.  The final row is a sentinel row that stays zero: all
out-of-bounds indices (image borders, padding slots of the capacity ladder)
point at it, turning border zero-padding and slot masking into plain gathers
with no branches.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from blockcopy_tpu.core import grid as gridlib

# Halo-exchange lowering:
#   'strips' (default): persist ONLY the 4 edge strips of every block.  The
#       halo never reads block interiors (centers are bypassed; neighbors
#       contribute edges only), so strip storage cuts per-layer halo memory
#       and scatter traffic by bs/(4p) (8-32x) — generalizing the reference
#       transfer kernel's halo-only fast path
#       (``utils/block_funcs.py:218-224``), which still stored full
#       features.  Fastest on v5e (SwiftNet-RN50 headline: 127 FPS vs 97
#       for 'full'; properly fenced measurements).
#   'full': full-feature canvas + center-bypassed strided-slice gathers.
#   'pallas': fused DMA kernel over the full canvas (ops/pallas/halo.py).
HALO_IMPL = os.environ.get("BLOCKCOPY_TPU_HALO", "strips")

__all__ = [
    "BlockPack",
    "ExecCtx",
    "is_block",
    "alloc_canvas",
    "split_dense",
    "dense_to_block_layout",
    "block_layout_to_dense",
    "scatter_pack",
    "halo_gather",
    "combine",
    "to_dense",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockPack:
    """Packed executed blocks: ``data[k]`` is block ``idx[k]``.

    ``data``: (capacity, bs, bs, C); ``idx``: (capacity,) flat block index in
    ``[0, N*GH*GW]`` where the value ``N*GH*GW`` marks an inert padding slot.
    Grid geometry (``n, gh, gw``) is static metadata.
    """

    data: jax.Array
    idx: jax.Array
    n: int = dataclasses.field(metadata=dict(static=True))
    gh: int = dataclasses.field(metadata=dict(static=True))
    gw: int = dataclasses.field(metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.data.shape[0]

    @property
    def block_size(self) -> int:
        return self.data.shape[1]

    @property
    def channels(self) -> int:
        return self.data.shape[-1]

    @property
    def total(self) -> int:
        return self.n * self.gh * self.gw

    def with_data(self, data: jax.Array) -> "BlockPack":
        return dataclasses.replace(self, data=data)


def is_block(x) -> bool:
    """Reference parity: ``blockcopy.is_block`` (``core/tensorwrapper.py:24``)."""
    return isinstance(x, BlockPack)


def alloc_canvas(n: int, gh: int, gw: int, bs: int, c: int, dtype) -> jax.Array:
    """Zero canvas with one extra sentinel row (stays zero forever)."""
    return jnp.zeros((n * gh * gw + 1, bs, bs, c), dtype=dtype)


def dense_to_block_layout(x: jax.Array, gh: int, gw: int) -> jax.Array:
    """(N, H, W, C) -> (N*GH*GW, bs, bs, C)."""
    n, h, w, c = x.shape
    bs_h, bs_w = h // gh, w // gw
    assert bs_h == bs_w, (x.shape, gh, gw)
    x = x.reshape(n, gh, bs_h, gw, bs_w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n * gh * gw, bs_h, bs_w, c)


def block_layout_to_dense(
    blocks: jax.Array, n: int, gh: int, gw: int
) -> jax.Array:
    """(N*GH*GW[+1], bs, bs, C) -> (N, GH*bs, GW*bs, C). Sentinel row dropped."""
    total = n * gh * gw
    blocks = blocks[:total]
    bs, c = blocks.shape[1], blocks.shape[-1]
    x = blocks.reshape(n, gh, gw, bs, bs, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, gh * bs, gw * bs, c)


def split_dense(
    x: jax.Array, idx: jax.Array, n: int, gh: int, gw: int
) -> BlockPack:
    """Gather executed blocks from a dense (N, H, W, C) image."""
    layout = dense_to_block_layout(x, gh, gw)
    data = jnp.take(layout, idx, axis=0, mode="fill", fill_value=0)
    return BlockPack(data=data, idx=idx, n=n, gh=gh, gw=gw)


def split_block_layout(
    canvas: jax.Array, idx: jax.Array, n: int, gh: int, gw: int
) -> BlockPack:
    """Gather executed blocks straight from a block-layout canvas."""
    data = jnp.take(canvas, idx, axis=0, mode="fill", fill_value=0)
    return BlockPack(data=data, idx=idx, n=n, gh=gh, gw=gw)


def scatter_pack(canvas: jax.Array, pack: BlockPack) -> jax.Array:
    """Write executed blocks into the canvas; padding slots (sentinel index)
    land on the sentinel row which is immediately re-zeroed.

    The canvas afterwards holds the latest known value of every block — the
    role the reference's combine-over-previous-output played
    (``core/tensorwrapper.py:397-443``).
    """
    canvas = canvas.at[pack.idx].set(pack.data.astype(canvas.dtype), mode="drop")
    # Padding slots wrote garbage to the sentinel row; restore it to zero so
    # border halos stay zero.
    return canvas.at[-1].set(0.0)


def halo_gather(
    canvas: jax.Array, pack_idx: jax.Array, pad: int, n: int, gh: int,
    gw: int, center: Optional[jax.Array] = None,
) -> jax.Array:
    """Gather ``(K, bs+2p, bs+2p, C)`` padded blocks from a canvas.

    Must be called *after* ``scatter_pack`` of the current frame's blocks so
    that executed neighbors contribute same-frame values — this ordering
    reproduces the reference repad kernel's executed-vs-transferred source
    selection (``utils/blockpad.py:108-146``) with zero control flow.

    ``center``: the freshly scattered block data ``(K, bs, bs, C)``; passing
    it skips re-reading the block interiors from HBM (only the halo strips
    are gathered) — the analogue of the reference transfer kernel's
    halo-only fast path (``utils/block_funcs.py:218-224``).
    """
    p = pad
    assert p > 0
    nbr = gridlib.neighbor_indices(pack_idx, n, gh, gw)  # (K, 8)
    tl, t, tr, l, r, bl, b, br = (nbr[:, i] for i in range(8))

    def take(src: jax.Array, i: jax.Array) -> jax.Array:
        # Sentinel row is zero, so OOB neighbors yield zero halo (= the dense
        # model's zero padding at image borders).
        return jnp.take(src, i, axis=0, mode="clip")

    if center is None:
        center = take(canvas, pack_idx)
    # Slice-then-gather: XLA fuses the strided slice into the gather so only
    # the strip bytes move.
    top = take(canvas[:, -p:, :, :], t)
    bottom = take(canvas[:, :p, :, :], b)
    left = take(canvas[:, :, -p:, :], l)
    right = take(canvas[:, :, :p, :], r)
    top_left = take(canvas[:, -p:, -p:, :], tl)
    top_right = take(canvas[:, -p:, :p, :], tr)
    bottom_left = take(canvas[:, :p, -p:, :], bl)
    bottom_right = take(canvas[:, :p, :p, :], br)

    row_top = jnp.concatenate([top_left, top, top_right], axis=2)
    row_mid = jnp.concatenate([left, center, right], axis=2)
    row_bot = jnp.concatenate([bottom_left, bottom, bottom_right], axis=2)
    return jnp.concatenate([row_top, row_mid, row_bot], axis=1)


def alloc_strip_canvas(n: int, gh: int, gw: int, bs: int, c: int, p: int,
                       dtype) -> Dict[str, jax.Array]:
    """Edge-strip storage for a halo site: rows holds [top p; bottom p] of
    every block, cols holds [left p; right p]; +1 zero sentinel row each."""
    total = n * gh * gw
    return {
        "rows": jnp.zeros((total + 1, 2 * p, bs, c), dtype),
        "cols": jnp.zeros((total + 1, bs, 2 * p, c), dtype),
    }


def scatter_strips(strips: Dict[str, jax.Array], pack: BlockPack,
                   p: int) -> Dict[str, jax.Array]:
    d = pack.data.astype(strips["rows"].dtype)
    rows = jnp.concatenate([d[:, :p], d[:, -p:]], axis=1)
    cols = jnp.concatenate([d[:, :, :p], d[:, :, -p:]], axis=2)
    new_rows = strips["rows"].at[pack.idx].set(rows, mode="drop").at[-1].set(0.0)
    new_cols = strips["cols"].at[pack.idx].set(cols, mode="drop").at[-1].set(0.0)
    return {"rows": new_rows, "cols": new_cols}


def gather_halo_strips(strips: Dict[str, jax.Array], pack_idx: jax.Array,
                       pad: int, n: int, gh: int, gw: int) -> Dict[str, jax.Array]:
    """Gather the 8 halo pieces of every executed block from strip storage.

    Returns ``{top (K,p,bs,C), bottom, left (K,bs,p,C), right,
    top_left (K,p,p,C), top_right, bottom_left, bottom_right}`` — fresh
    values where the neighbor executed this frame (strips were just
    scattered), previous-frame values otherwise, zeros past image borders
    (sentinel row)."""
    p = pad
    rows, cols = strips["rows"], strips["cols"]
    sp = rows.shape[1] // 2  # stored strip width (== site's pad)
    assert sp == p, (sp, p)
    nbr = gridlib.neighbor_indices(pack_idx, n, gh, gw)
    tl, t, tr, l, r, bl, b, br = (nbr[:, i] for i in range(8))

    take = lambda src, i: jnp.take(src, i, axis=0, mode="clip")
    return {
        "top": take(rows[:, p:], t),          # neighbor-above's bottom rows
        "bottom": take(rows[:, :p], b),       # neighbor-below's top rows
        "left": take(cols[:, :, p:], l),      # left neighbor's right cols
        "right": take(cols[:, :, :p], r),     # right neighbor's left cols
        "top_left": take(rows[:, p:, -p:], tl),
        "top_right": take(rows[:, p:, :p], tr),
        "bottom_left": take(rows[:, :p, -p:], bl),
        "bottom_right": take(rows[:, :p, :p], br),
    }


def halo_gather_strips(strips: Dict[str, jax.Array], pack_idx: jax.Array,
                       pad: int, n: int, gh: int, gw: int,
                       center: jax.Array) -> jax.Array:
    """Assemble (K, bs+2p, bs+2p, C) padded blocks from edge-strip storage.
    Semantics identical to ``halo_gather`` over a full canvas."""
    h = gather_halo_strips(strips, pack_idx, pad, n, gh, gw)
    row_top = jnp.concatenate(
        [h["top_left"], h["top"], h["top_right"]], axis=2)
    row_mid = jnp.concatenate([h["left"], center, h["right"]], axis=2)
    row_bot = jnp.concatenate(
        [h["bottom_left"], h["bottom"], h["bottom_right"]], axis=2)
    return jnp.concatenate([row_top, row_mid, row_bot], axis=1)


@dataclasses.dataclass
class ExecCtx:
    """Trace-time execution context threaded through a blocked model.

    ``canvases`` maps a stable layer name -> persistent feature canvas; the
    dict is read/updated while tracing and becomes part of the carried
    temporal state (the functional replacement for the reference's
    ``BlockFeatures`` FIFOs whose correctness relied on an identical op
    sequence every frame — here alignment is by name, structurally).

    ``idx`` is the shared flat index vector of executed blocks: the grid is
    identical at every feature resolution, only the per-block pixel size
    changes.

    A ``dense`` ctx (``ExecCtx.dense()``) makes every layer run the ordinary
    dense computation, giving the static baseline from the same model code.
    """

    mode: str  # 'blocked' | 'dense'
    n: int = 1
    gh: int = 0
    gw: int = 0
    idx: Optional[jax.Array] = None
    canvases: Dict[str, jax.Array] = dataclasses.field(default_factory=dict)
    # When True, canvases are created on the fly (shape-inference pass).
    building: bool = False
    # Trace-time multiply-accumulate tally keyed by layer name (shared
    # mutable dict so dense sub-contexts attribute to the same tally).
    # Replaces the reference's hook-based flops counters (ptflops /
    # Pedestron tools/flopscounter.py, whose per-submodule cost tree is
    # reproduced by ``macs_by_module``): shapes are static under jit, so
    # the count is exact and free.
    macs: Dict[str, float] = dataclasses.field(default_factory=dict)
    # Canvas names already written this frame: a second store through the
    # same name in one frame means two call sites are silently sharing one
    # temporal canvas (e.g. two ``to_dense`` calls with the default name),
    # which corrupts copied blocks with the other site's features.
    stored_names: set = dataclasses.field(default_factory=set)

    @classmethod
    def dense(cls) -> "ExecCtx":
        return cls(mode="dense")

    def as_dense(self) -> "ExecCtx":
        """A dense view sharing this ctx's canvases and MAC tally (used by
        ``noblocks`` interiors such as SPP)."""
        return dataclasses.replace(self, mode="dense")

    def add_macs(self, count: float, name: str = "") -> None:
        self.macs[name] = self.macs.get(name, 0.0) + float(count)

    @property
    def total_macs(self) -> float:
        return sum(self.macs.values())

    def macs_by_module(self) -> Dict[str, float]:
        """Tally grouped by top-level module (first dot-segment of the layer
        name) — the shape of the reference's per-submodule cost tree
        (``Pedestron/tools/flopscounter.py:176-220``)."""
        out: Dict[str, float] = {}
        for name, v in self.macs.items():
            key = name.split(".", 1)[0] if name else "other"
            out[key] = out.get(key, 0.0) + v
        return out

    @classmethod
    def blocked(cls, idx, n, gh, gw, canvases, building=False) -> "ExecCtx":
        return cls(
            mode="blocked", n=n, gh=gh, gw=gw, idx=idx, canvases=canvases,
            building=building,
        )

    @property
    def is_dense(self) -> bool:
        return self.mode == "dense"

    def canvas_for(self, name: str, like: BlockPack) -> jax.Array:
        if name not in self.canvases:
            if not self.building:
                raise KeyError(
                    f"no canvas for layer '{name}'; temporal state was not "
                    f"initialized for this model (did the op sequence change?)"
                )
            self.canvases[name] = alloc_canvas(
                self.n, self.gh, self.gw, like.block_size, like.channels,
                like.data.dtype,
            )
        return self.canvases[name]

    def strip_canvas_for(self, name: str, like: BlockPack,
                         pad: int) -> Dict[str, jax.Array]:
        if name not in self.canvases:
            if not self.building:
                raise KeyError(
                    f"no canvas for layer '{name}'; temporal state was not "
                    f"initialized for this model (did the op sequence change?)"
                )
            self.canvases[name] = alloc_strip_canvas(
                self.n, self.gh, self.gw, like.block_size, like.channels,
                pad, like.data.dtype,
            )
        return self.canvases[name]

    def exchange(self, name: str, x: BlockPack, pad: int) -> jax.Array:
        """Scatter current blocks' halo-relevant state into the named canvas,
        return halo-padded blocks ``(K, bs+2p, bs+2p, C)``."""
        if HALO_IMPL == "strips":
            strips = self.strip_canvas_for(name, x, pad)
            strips = scatter_strips(strips, x, pad)
            self.canvases[name] = strips
            return halo_gather_strips(strips, x.idx, pad, self.n, self.gh,
                                      self.gw, x.data.astype(
                                          strips["rows"].dtype))
        canvas = self.canvas_for(name, x)
        canvas = scatter_pack(canvas, x)
        self.canvases[name] = canvas
        center = x.data.astype(canvas.dtype)
        if HALO_IMPL == "pallas":
            from blockcopy_tpu.ops.pallas.halo import halo_gather_pallas
            return halo_gather_pallas(canvas, x.idx, pad, self.n, self.gh,
                                      self.gw, center)
        return halo_gather(canvas, x.idx, pad, self.n, self.gh, self.gw,
                           center=center)

    def exchange_pieces(self, name: str, x: BlockPack,
                        pad: int) -> Optional[Dict[str, jax.Array]]:
        """Like ``exchange`` but returns the 8 halo pieces *unassembled*
        (no ``(K, bs+2p, bs+2p, C)`` materialization) — the input of the
        border-correction conv lowering (``ops/layers.py:conv2d``).

        Only strip storage supports this; returns ``None`` under the
        'full'/'pallas' canvas lowerings (caller falls back to
        ``exchange``)."""
        if HALO_IMPL != "strips":
            return None
        strips = self.strip_canvas_for(name, x, pad)
        strips = scatter_strips(strips, x, pad)
        self.canvases[name] = strips
        return gather_halo_strips(strips, x.idx, pad, self.n, self.gh,
                                  self.gw)

    def store_blocks(self, name: str, x: BlockPack) -> jax.Array:
        """Scatter blocks into the named canvas and return the canvas in
        BLOCK layout ``(N*GH*GW+1, bs, bs, C)`` — ``store_dense`` without
        the dense rebuild, for consumers that can stay block-major
        (``core/stepper.py`` OUT_BLOCKS lowering)."""
        if name in self.stored_names:
            raise ValueError(
                f"canvas '{name}' was already stored this frame: two call "
                f"sites are sharing one temporal canvas — pass distinct "
                f"``name``s (skipped blocks would silently receive the "
                f"other site's features)")
        self.stored_names.add(name)
        canvas = self.canvas_for(name, x)
        canvas = scatter_pack(canvas, x)
        self.canvases[name] = canvas
        return canvas

    def store_dense(self, name: str, x: BlockPack) -> jax.Array:
        """Scatter blocks into the named canvas and return the dense image —
        the reference's ``combine_()`` (``core/tensorwrapper.py:391-395``)."""
        canvas = self.store_blocks(name, x)
        return block_layout_to_dense(canvas, self.n, self.gh, self.gw)

    def split_like(self, x: jax.Array) -> BlockPack:
        """Dense image -> executed blocks with this ctx's grid — the
        reference's ``to_blocks_like`` (``core/tensorwrapper.py:325-333``)."""
        return split_dense(x, self.idx, self.n, self.gh, self.gw)


def combine(ctx: ExecCtx, name: str, x: BlockPack) -> jax.Array:
    """Public helper: blocked -> dense through a persistent canvas."""
    return ctx.store_dense(name, x)


def to_dense(x, ctx: Optional[ExecCtx] = None, name: str = "out"):
    """Reference parity with ``blockcopy.to_tensor``: dense tensors pass
    through, packs are combined through ``ctx``."""
    if isinstance(x, BlockPack):
        assert ctx is not None
        return combine(ctx, name, x)
    return x
