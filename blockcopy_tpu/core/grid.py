"""Execution-grid utilities.

The execution grid is a boolean array of shape ``(N, GH, GW)`` marking which
spatial blocks of each image in the batch must be executed this frame; the
rest are copied from the previous frame.

TPU-first redesign notes (vs. reference ``blockcopy/blockcopy/core/
tensorwrapper.py:108-178`` which builds index mappings on the *CPU* with
``torch.nonzero``/``masked_scatter`` and ships them to the device): here all
index bookkeeping happens on-device inside ``jit`` with *static* shapes.  The
variable number of executed blocks is handled with a fixed-capacity index
vector (``exec_indices``) padded with an out-of-bounds sentinel; gathers use
``mode='fill'`` and scatters ``mode='drop'`` so padding slots are inert.

The capacity ladder mirrors the reference's own shape-quantization trick
(``blockcopy/blockcopy/policy/policy.py:124-144``): the number of executed
blocks is rounded up to a multiple of ``total * quantum`` so only a small set
of compiled program shapes ever exists.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "grid_shape",
    "num_blocks",
    "quantize_grid",
    "capacity_for_count",
    "capacity_ladder",
    "exec_indices",
    "neighbor_indices",
]


def grid_shape(height: int, width: int, block_size: int) -> Tuple[int, int]:
    """Grid height/width for an image of ``height x width`` pixels."""
    if height % block_size or width % block_size:
        raise ValueError(
            f"image size ({height}, {width}) not divisible by block size {block_size}"
        )
    return height // block_size, width // block_size


def num_blocks(n: int, gh: int, gw: int) -> int:
    return n * gh * gw


def quantize_grid(key: jax.Array, grid: jax.Array, quantum: float) -> jax.Array:
    """Round the number of executed blocks *up* to a multiple of
    ``total * quantum`` by enabling extra randomly-chosen blocks.

    Matches the semantics of the reference's ``quantize_number_exec_grid``
    (``policy/policy.py:124-144``) but runs on-device: blocks are ranked by
    (already-executed, random key) and the top ``target`` are enabled.

    Note: quantization is joint over the whole batch, like the reference
    (which flattens ``grid`` including the batch dimension).
    """
    if quantum <= 0:
        return grid
    flat = grid.reshape(-1)
    total = flat.shape[0]
    multiple = int(total * quantum)
    if multiple <= 0:
        return grid
    n_exec = jnp.sum(flat.astype(jnp.int32))
    # ceil to next multiple: multiple * (1 + (n-1)//multiple); n==0 -> 0
    target = jnp.where(
        n_exec > 0, multiple * (1 + (n_exec - 1) // multiple), 0
    ).astype(jnp.int32)
    # rank: executed blocks first (score + 2), then random among the rest
    scores = jax.random.uniform(key, (total,)) + 2.0 * flat.astype(jnp.float32)
    order = jnp.argsort(-scores)  # descending: exec blocks lead
    rank = jnp.zeros((total,), jnp.int32).at[order].set(
        jnp.arange(total, dtype=jnp.int32)
    )
    return (rank < target).reshape(grid.shape)


def capacity_for_count(count: int, total: int, quantum: float) -> int:
    """Host-side: smallest ladder capacity >= count."""
    if count <= 0:
        return 0
    multiple = max(1, int(total * quantum)) if quantum > 0 else 1
    return min(total, multiple * math.ceil(count / multiple))


def capacity_ladder(total: int, quantum: float):
    """All capacities that can occur for this grid size."""
    if quantum <= 0:
        return list(range(1, total + 1))
    multiple = max(1, int(total * quantum))
    return list(range(multiple, total + 1, multiple)) + (
        [total] if total % multiple else []
    )


def exec_indices(grid: jax.Array, capacity: int) -> jax.Array:
    """Flat indices (into ``N*GH*GW``) of executed blocks, padded to a static
    ``capacity`` with the out-of-bounds sentinel ``total`` (== N*GH*GW).

    Replaces the reference's CPU-side ``get_grid_mappings``
    (``core/tensorwrapper.py:108-128``).
    """
    flat = grid.reshape(-1)
    total = flat.shape[0]
    (idx,) = jnp.nonzero(flat, size=capacity, fill_value=total)
    return idx.astype(jnp.int32)


def neighbor_indices(
    idx: jax.Array, n: int, gh: int, gw: int
) -> jax.Array:
    """For each flat block index, the flat indices of its 8 spatial neighbors
    in order (TL, T, TR, L, R, BL, B, BR); out-of-image neighbors (and
    padding slots) map to the sentinel ``n*gh*gw``.
    """
    total = n * gh * gw
    g = idx % (gh * gw)
    b = idx // (gh * gw)
    gy = g // gw
    gx = g % gw
    offs = jnp.array(
        [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)],
        dtype=jnp.int32,
    )
    ny = gy[:, None] + offs[None, :, 0]
    nx = gx[:, None] + offs[None, :, 1]
    ok = (
        (ny >= 0)
        & (ny < gh)
        & (nx >= 0)
        & (nx < gw)
        & (idx[:, None] < total)
    )
    flat = b[:, None] * (gh * gw) + ny * gw + nx
    return jnp.where(ok, flat, total).astype(jnp.int32)
