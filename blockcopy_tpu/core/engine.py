"""BlockCopy execution engine: the per-frame pipeline.

TPU-native equivalent of the reference ``BlockCopyModel``
(``blockcopy/blockcopy/core/blockcopy.py:7-89``).  Each frame runs three
compiled programs:

1. policy forward  (sample the execution grid; one program, any frame)
2. blocked model step (one compiled program **per capacity** on the
   quantization ladder — the static-shape answer to the reference's
   per-shape cudnn.benchmark caching)
3. policy optimize (REINFORCE update, gated by the train interval)

The only host sync per frame is the executed-block count (used to pick the
compiled capacity) — the moral equivalent of the reference's deliberate CPU
grid bookkeeping (``core/tensorwrapper.py:158-173``) but a single scalar.

Temporal state is an explicit pytree of per-layer feature canvases plus the
output/frame-state canvases; it is donated to the step so XLA updates the
HBM buffers in place.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import (
    BlockPack,
    ExecCtx,
    split_dense,
)
from blockcopy_tpu.policy.policies import build_policy_from_settings
from blockcopy_tpu.utils.flops import FlopsTracker, policy_net_macs
from blockcopy_tpu.utils.profiler import timings

FRAME_STATE = "__frame_state__"
OUT = "__out__"


def noblocks(ctx: ExecCtx, name: str, x, fn: Callable):
    """Run ``fn`` densely in the middle of a blocked model: combine the
    blocks through a persistent canvas, apply ``fn(dense_ctx, dense_x)``,
    gather the executed blocks of the result.

    Equivalent of the reference's ``@blockcopy_noblocks`` decorator
    (``core/blockcopy.py:92-122``), used e.g. around SwiftNet's SPP.
    The dense sub-context shares the parent's MAC tally.
    """
    if not isinstance(x, BlockPack) or ctx.is_dense:
        return fn(ctx.as_dense() if isinstance(ctx, ExecCtx) else ctx, x)
    dense = ctx.store_dense(name, x)
    y = fn(ctx.as_dense(), dense)
    return split_dense(y, ctx.idx, ctx.n, ctx.gh, ctx.gw)


# API-parity alias with the reference decorator name.
blockcopy_noblocks = noblocks


class BlockCopyModel:
    """Wraps a blocked-model apply function with the BlockCopy frame loop.

    Args:
        apply_fn: ``apply_fn(params, x, ctx) -> output`` where ``x`` is a
            ``BlockPack`` (blocked mode) or dense array, and ``ctx`` is an
            ``ExecCtx``.  Output spatial stride vs. input must be constant.
        params: model parameter pytree (typically bfloat16).
        settings: the blockcopy settings dict (see ``core/argparser.py``).
    """

    def __init__(self, apply_fn: Callable, params, settings: dict,
                 policy=None):
        self.is_blockcopy_manager = True
        self.apply_fn = apply_fn
        self.params = params
        self.settings = settings
        self.policy = policy or build_policy_from_settings(settings)
        self.block_size = settings["block_size"]
        self.train_interval = settings["block_train_interval"]
        self.quantum = settings.get("block_quantize_number_exec", 1.0 / 16.0)

        self._geom = None  # (n, gh, gw)
        self._frame_shape = None
        self.temporal = None
        self._steps: Dict[int, Callable] = {}
        self.flops = FlopsTracker()
        self.reset_temporal()

    # -- temporal state -----------------------------------------------------

    def reset_temporal(self):
        """Reset per-clip state (reference ``core/blockcopy.py:34-43``).

        Canvases are *kept allocated*: frame 1 executes all blocks and
        overwrites every canvas, so zeroing is unnecessary.
        """
        self.clip_length = 0
        self.policy_meta = {"inputs": None, "outputs": None,
                            "outputs_prev": None}

    def _init_temporal(self, frame):
        n, h, w, _ = frame.shape
        gh, gw = gridlib.grid_shape(h, w, self.block_size)
        self._geom = (n, gh, gw)
        self._frame_shape = tuple(frame.shape)
        total = n * gh * gw

        def build(f):
            idx = jnp.arange(total, dtype=jnp.int32)
            ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
            pack = split_dense(f, idx, n, gh, gw)
            ctx.store_dense(FRAME_STATE, pack)
            out = self.apply_fn(self.params, pack, ctx)
            ctx.store_dense(OUT, out)
            return ctx.canvases

        shapes = jax.eval_shape(build, jax.ShapeDtypeStruct(frame.shape,
                                                            frame.dtype))
        self.temporal = {
            "canvases": jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            )
        }
        if self.policy.is_trainable():
            scale = 0.25 * 128 / self.block_size
            self.flops.policy_macs = policy_net_macs(
                int(h * scale), int(w * scale),
                self.settings.get("block_num_classes", 19),
                arch=self.settings.get("block_policy_arch", "ref"),
            )

    # -- compiled steps -----------------------------------------------------

    def _get_step(self, capacity: int) -> Callable:
        step = self._steps.get(capacity)
        if step is not None:
            return step
        n, gh, gw = self._geom

        @partial(jax.jit, donate_argnums=(1,))
        def model_step(params, temporal, frame, grid):
            idx = gridlib.exec_indices(grid, capacity)
            pack = split_dense(frame, idx, n, gh, gw)
            ctx = ExecCtx.blocked(idx, n, gh, gw, temporal["canvases"])
            frame_state = ctx.store_dense(FRAME_STATE, pack)
            out = self.apply_fn(params, pack, ctx)
            outputs = ctx.store_dense(OUT, out)
            # trace-time: exact MACs of this capacity's program
            self.flops.record_trace(capacity, ctx.macs_by_module())
            return {"canvases": ctx.canvases}, outputs, frame_state

        self._steps[capacity] = model_step
        return model_step

    # -- checkpoint / resume --------------------------------------------------
    # The reference never persists the online policy (retrained from scratch
    # each run, semantic_segmentation/README.md:18); here both the policy and
    # the temporal canvases are checkpointable so warmup can be amortized and
    # clips resumed mid-stream.

    def save_policy(self, path: str) -> None:
        from blockcopy_tpu.utils.policy_ckpt import save_ladder_policy

        save_ladder_policy(self.policy, path)

    def load_policy(self, path: str) -> None:
        from blockcopy_tpu.utils.policy_ckpt import load_ladder_policy

        load_ladder_policy(self.policy, path)

    # -- frame loop ---------------------------------------------------------

    def __call__(self, inputs):
        return self._forward_blockcopy(inputs)

    forward = __call__

    def _forward_blockcopy(self, inputs):
        """One frame.  ``inputs``: dense (N, H, W, 3), normalized."""
        self.clip_length += 1
        meta = self.policy_meta
        meta["inputs"] = inputs

        with timings.env("blockcopy/policy_forward", 3):
            meta = self.policy(meta)

        with timings.env("blockcopy/model", 3):
            if self.temporal is None or self._geom is None:
                self._init_temporal(inputs)
            elif tuple(inputs.shape) != self._frame_shape:
                # compiled steps and canvases close over the grid geometry;
                # fail loudly instead of dying inside jit with an opaque
                # scatter shape mismatch
                raise ValueError(
                    f"frame shape changed {self._frame_shape} -> "
                    f"{tuple(inputs.shape)}: the engine's temporal state "
                    f"and compiled programs are geometry-static; build a "
                    f"new BlockCopyModel for a different resolution")

            count = meta["num_exec"]
            if count == 0:
                out = meta["outputs"]
                capacity = 0
            else:
                total = meta["num_total"]
                capacity = gridlib.capacity_for_count(count, total,
                                                      self.quantum)
                step = self._get_step(capacity)
                self.temporal, out, frame_state = step(
                    self.params, self.temporal, inputs, meta["grid"]
                )
                meta["frame_state"] = frame_state
            self.flops.record_frame(
                capacity, policy_ran=meta.get("_rl_cache") is not None,
                images=inputs.shape[0],
            )

            meta["outputs_prev"] = meta["outputs"]
            meta["outputs"] = out

        with timings.env("blockcopy/policy_optim", 3):
            train_policy = self.clip_length % self.train_interval == 0
            self.policy_meta = self.policy.optim(meta, train=train_policy)
        return out
