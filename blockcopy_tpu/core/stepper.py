"""Fused per-frame step: policy forward + blocked model + REINFORCE update as
ONE jitted program with a fixed block capacity.

Two execution modes exist (SURVEY.md §7 "fixed-capacity block buffers"):

* **Ladder mode** (``core/engine.BlockCopyModel``): the executed-block count
  picks a compiled capacity per frame — faithful to the reference's variable
  batch dimension + shape quantization (``policy/policy.py:124-144``), one
  scalar host sync per frame.
* **Fixed-capacity mode** (this module): the sampled grid is rounded to
  *exactly* ``capacity`` executed blocks, so every frame runs the same
  compiled program with **zero host syncs** — the TPU-native analogue of the
  reference's ``--fast`` speed configs, and the form that shards over a
  device mesh (each device steps one clip; policy gradients are psum'd).

The carried state is an explicit pytree (the functional replacement for the
reference's ``BlockCopyModel`` attributes + ``policy_meta`` dict +
``BlockFeatures`` FIFOs).  Donate it to the step for in-place HBM updates.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.core.blocked import (
    ExecCtx,
    block_layout_to_dense,
    scatter_pack,
    split_dense,
)
from blockcopy_tpu.ops.layers import adaptive_max_pool2d, resize_bilinear
from blockcopy_tpu.policy import optim as rmsprop
from blockcopy_tpu.policy.information_gain import semseg_information_gain
from blockcopy_tpu.policy import net as _polnet
from blockcopy_tpu.policy.net import (
    assemble_policy_input,
    assemble_policy_input_split,
    init_policy_net,
    policy_in_channels,
    policy_net_apply,
)

FRAME_STATE = "__frame_state__"
OUT = "__out__"
# Carry the semseg task outputs in BLOCK layout end-to-end: state["outputs"]
# is the (N*GH*GW+1, bs/4, bs/4, C) canvas itself instead of its dense
# rebuild, the information-gain reward is computed per block (exactly equal:
# the 0.25 bilinear taps never cross block borders and the reward pool is
# per-block max), and the dense image is rebuilt only at policy-input
# assembly / fetch.  Removes the every-frame scatter->transpose layout
# ping-pong the r3 profile attributed ~0.15 ms to.  Decided by full-program
# A/B; fetch sites use ``FixedCapacityStepper.fetch_outputs``.
# MEASURED r4: LOSES -3.5% at program level (docs/NEXT_ROUND.md) — keep off.
OUT_BLOCKS = os.environ.get("BLOCKCOPY_TPU_OUT_BLOCKS", "0") == "1"
# Lane-packed OUT canvas: store the logits canvas as (total+1, bs, bs*C)
# instead of (total+1, bs, bs, C).  C=19 wastes 85% of every (8,128) lane
# tile (19 -> 128 pad); merging the minor dims packs lanes to 608 -> 640
# pad (5% waste), shrinking the canvas' carried/copied bytes ~6x.  The r4
# profile attributed ~0.28 ms/frame to the 19-ch output chain (canvas IO
# relayout copies + scatter + dense rebuild).  Decided by full-program A/B.
PACKED_OUT = os.environ.get("BLOCKCOPY_TPU_PACKED_OUT", "0") == "1"
# The policy consumes the frame-state composite at 1/4*(128/bs) scale, i.e.
# 32 px per block regardless of block size — so the canvas stores blocks
# already nearest-downsampled to 32x32 instead of materializing (and then
# downsampling) a full-resolution composite every frame.
FS_BS = 32


@dataclasses.dataclass(frozen=True)
class StepperConfig:
    block_size: int = 128
    block_target: float = 0.5
    complexity_weight: float = 5.0
    cost_momentum: float = 0.9
    train_interval: int = 4
    lr: float = 1e-4
    weight_decay: float = 1e-3
    momentum: float = 0.0
    num_classes: int = 19
    # 'ref' = the reference PolicyNet architecture (parity-tested);
    # 'fast' = TPU-native space-to-depth trunk (policy/net.py), same
    # REINFORCE machinery, ~3x fewer activation bytes
    policy_arch: str = "ref"

    @classmethod
    def from_settings(cls, s: dict) -> "StepperConfig":
        return cls(
            block_size=s["block_size"],
            block_target=s["block_target"],
            complexity_weight=s["block_complexity_weight"],
            cost_momentum=s["block_cost_momentum"],
            train_interval=s["block_train_interval"],
            lr=s["block_optim_lr"],
            weight_decay=s["block_optim_wd"],
            momentum=s["block_optim_momentum"],
            num_classes=s["block_num_classes"],
            policy_arch=s.get("block_policy_arch", "ref"),
        )


class FixedCapacityStepper:
    """Builds the jit-able ``first_step`` / ``step`` functions.

    ``apply_fn(params, x, ctx)`` is the blocked model; geometry is fixed at
    construction so the whole step is a static program.

    Task-specific points are overridable hooks (the reference hard-wires the
    semseg path in ``BlockCopyModel`` and inlines detection in
    ``csp_blockcopy.py:46-95``; here a task stepper subclasses):

    * ``task_keys`` — names of per-frame task outputs carried in the state
      (each also keeps a ``<key>_prev`` copy of the previous frame's value);
    * ``_model_fn`` — run the blocked model, return the task-output dict;
    * ``_output_repr`` — task representation fed to the policy net;
    * ``_information_gain`` — the REINFORCE reward map.
    """

    task_keys = ("outputs",)

    def __init__(self, apply_fn: Callable, cfg: StepperConfig,
                 frame_shape, capacity: int, dtype=jnp.float32):
        self.apply_fn = apply_fn
        self.cfg = cfg
        n, h, w, _ = frame_shape
        self.frame_shape = tuple(frame_shape)
        gh, gw = gridlib.grid_shape(h, w, cfg.block_size)
        self.geom = (n, gh, gw)
        self.total = n * gh * gw
        self.capacity = min(capacity, self.total)
        self.dtype = dtype

    def _store_frame_state(self, ctx, pack) -> None:
        """Scatter the current frame's blocks into the FRAME_STATE canvas at
        policy resolution (nearest-downsampled per block; pixels identical to
        downsampling the full-res composite, since the sampling stride
        divides the block size)."""
        k = pack.block_size // FS_BS
        if k <= 1:
            small = pack
        else:
            # NOTE: a reshape+unit-slice lowering of this sampling was
            # A/B'd at the full-program level and measured identical
            # (221.3 vs 219.3 FPS) — the gather is not the cost
            r = (jnp.arange(FS_BS) * k).astype(jnp.int32)
            small = dataclasses.replace(pack, data=pack.data[:, r][:, :, r])
        canvas = ctx.canvas_for(FRAME_STATE, small)
        ctx.canvases[FRAME_STATE] = scatter_pack(canvas, small)

    # -- task hooks ----------------------------------------------------------

    def _model_fn(self, params, pack, ctx) -> Dict:
        """Blocked model -> task outputs (stored into the carried state under
        ``task_keys``).  Semseg: the stride-4 logits — dense, or the block-
        layout canvas under ``OUT_BLOCKS``."""
        out = self.apply_fn(params, pack, ctx)
        if OUT_BLOCKS:
            return {"outputs": ctx.store_blocks(OUT, out)}
        if PACKED_OUT:
            return {"outputs": self._store_dense_packed(ctx, out)}
        return {"outputs": ctx.store_dense(OUT, out)}

    def _store_dense_packed(self, ctx, out) -> jax.Array:
        """``store_dense`` through a lane-packed (total+1, bs, bs*C) canvas;
        returns the same dense (N, H/4, W/4, C) image."""
        k, b, _, c = out.data.shape
        n, gh, gw = self.geom
        name = OUT
        if name not in ctx.canvases:
            assert ctx.building
            ctx.canvases[name] = jnp.zeros(
                (self.total + 1, b, b * c), out.data.dtype)
        canvas = ctx.canvases[name]
        canvas = canvas.at[out.idx].set(
            out.data.reshape(k, b, b * c).astype(canvas.dtype), mode="drop"
        ).at[-1].set(0.0)
        ctx.canvases[name] = canvas
        return block_layout_to_dense(
            canvas.reshape(self.total + 1, b, b, c), n, gh, gw)

    def fetch_outputs(self, state) -> jax.Array:
        """Dense (N, H/4, W/4, C) task outputs regardless of the carried
        layout (callers: CLIs, tests, viz)."""
        out = state["outputs"]
        if OUT_BLOCKS and out.shape[0] == self.total + 1:
            n, gh, gw = self.geom
            return block_layout_to_dense(out, n, gh, gw)
        return out

    def _output_repr(self, state):
        """Previous-frame output representation for the policy input
        (semseg: raw logits, reference ``information_gain.py:27-30``).

        Under ``OUT_BLOCKS`` the block-layout canvas is nearest-resized per
        block to policy resolution (32 px/block) and THEN transposed dense —
        pixel-identical to resizing the dense rebuild, because block
        boundaries align with the sampling groups — so the downstream
        ``assemble_policy_input`` resize short-circuits."""
        out = state["outputs"]
        if not OUT_BLOCKS:
            return out
        n, gh, gw = self.geom
        blocks = out[: self.total]
        b = blocks.shape[1]
        if b != FS_BS:
            r = (jnp.arange(FS_BS) * b // FS_BS).astype(jnp.int32)
            blocks = blocks[:, r][:, :, r]
        return block_layout_to_dense(blocks, n, gh, gw)

    def _information_gain(self, state):
        return semseg_information_gain(state["outputs"],
                                       state["outputs_prev"])

    def _reward_grid(self, state) -> jax.Array:
        """(n, gh, gw) information-gain reward, max-pooled per block
        (reference ``policy/policy.py:339`` adaptive_max_pool2d).

        Under ``OUT_BLOCKS`` (semseg only — detection carries no "outputs"
        key) the KL is computed per block on the canvases: the 0.25
        bilinear taps stay inside aligned 4-px groups, so per-block resize
        + KL + per-block max == the dense pipeline exactly."""
        n, gh, gw = self.geom
        if OUT_BLOCKS and "outputs" in state \
                and state["outputs"].shape[0] == self.total + 1:
            cur = state["outputs"][: self.total].astype(jnp.float32)
            prev = state["outputs_prev"][: self.total].astype(jnp.float32)
            b = cur.shape[1]
            oh = max(1, b // 4)
            cur = resize_bilinear(cur, (oh, oh))
            prev = resize_bilinear(prev, (oh, oh))
            log_p = jax.nn.log_softmax(cur, axis=-1)
            log_q = jax.nn.log_softmax(prev, axis=-1)
            kl = (jnp.exp(log_q) * (log_q - log_p)).mean(axis=-1)
            return kl.max(axis=(1, 2)).reshape(n, gh, gw)
        ig = self._information_gain(state)
        return adaptive_max_pool2d(ig, (gh, gw))[..., 0]

    # -- state --------------------------------------------------------------

    def init_policy_state(self, key) -> Dict:
        # fast arch: logit-head bias starts at logit(block_target) — at
        # target 0.5 exactly the pre-r5 zero init (see policy/net.py)
        t = min(max(self.cfg.block_target, 1e-3), 1 - 1e-3)
        head_bias = math.log(t / (1.0 - t)) \
            if self.cfg.policy_arch == "fast" else 0.0
        params, bn_state = init_policy_net(
            key, policy_in_channels(self.cfg.num_classes),
            arch=self.cfg.policy_arch, head_bias=head_bias,
        )
        return {
            "params": params,
            "bn_state": bn_state,
            "opt": rmsprop.init(params),
            "running_cost": jnp.float32(-1.0),  # <0 == uninitialized
            "key": key,
        }

    def init_state(self, model_params, key) -> Dict:
        """Full carried state with zeroed canvases (shapes via eval_shape)."""
        n, gh, gw = self.geom

        def build(frame):
            idx = jnp.arange(self.total, dtype=jnp.int32)
            ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
            pack = split_dense(frame, idx, n, gh, gw)
            self._store_frame_state(ctx, pack)
            task = self._model_fn(model_params, pack, ctx)
            return ctx.canvases, task

        canvas_shapes, task_shapes = jax.eval_shape(
            build, jax.ShapeDtypeStruct(self.frame_shape, self.dtype)
        )
        zeros = lambda s: jnp.zeros(s.shape, s.dtype)
        state = {
            "canvases": jax.tree.map(zeros, canvas_shapes),
            "prev_grid": jnp.zeros((n, gh, gw), jnp.float32),
            "frame_idx": jnp.int32(0),
            "policy": self.init_policy_state(key),
        }
        for k in self.task_keys:
            state[k] = jax.tree.map(zeros, task_shapes[k])
            state[f"{k}_prev"] = jax.tree.map(zeros, task_shapes[k])
        return state

    def macs_per_step(self, model_params, policy: bool = True) -> float:
        """Exact model MACs of one steady-state step (capacity blocks), plus
        the policy-net cost; counted at trace time (shapes are static)."""
        return sum(self.macs_breakdown_per_step(model_params, policy).values())

    def macs_breakdown_per_step(self, model_params,
                                policy: bool = True) -> Dict[str, float]:
        """Per-module MACs of one steady-state step (reference analogue:
        the flops-counter's per-submodule tree, ``Pedestron/README.md:51-62``)."""
        from blockcopy_tpu.utils.flops import policy_net_macs

        n, gh, gw = self.geom
        box = {}

        def f(frame):
            idx = jnp.zeros((self.capacity,), jnp.int32)
            ctx = ExecCtx.blocked(idx, n, gh, gw, {}, building=True)
            pack = split_dense(frame, idx, n, gh, gw)
            self._store_frame_state(ctx, pack)
            task = self._model_fn(model_params, pack, ctx)
            box["by_module"] = ctx.macs_by_module()
            return task

        jax.eval_shape(f, jax.ShapeDtypeStruct(self.frame_shape, self.dtype))
        breakdown = dict(box["by_module"])
        if policy:
            _, h, w, _ = self.frame_shape
            scale = 0.25 * 128 / self.cfg.block_size
            breakdown["policy"] = policy_net_macs(
                int(h * scale), int(w * scale), self.cfg.num_classes,
                arch=self.cfg.policy_arch)
        return breakdown

    @staticmethod
    def check_policy_finite(policy_state: Dict, phase: str) -> None:
        """Phase-boundary NaN guard shared by both CLIs: one bad REINFORCE
        update would otherwise silently corrupt the policy for the rest of
        the run.  Arch-agnostic: sums across ALL param leaves (a non-finite
        value confined to one leaf — plausible for the fast arch whose
        zero-init head decouples trunk gradients early — must not slip
        through) + running_cost; still one host sync per phase."""
        import numpy as np

        rc = np.asarray(policy_state["running_cost"])
        w = np.asarray(jax.tree_util.tree_reduce(
            lambda a, leaf: a + jnp.sum(jnp.asarray(leaf, jnp.float32)),
            policy_state["params"], jnp.float32(0.0)))
        if not (np.isfinite(rc).all() and np.isfinite(w)):
            raise FloatingPointError(
                f"policy state non-finite after {phase} "
                f"(running_cost={rc}); training diverged")

    def reset_temporal(self, state: Dict) -> Dict:
        """New clip: reset the frame counter (canvases are fully overwritten
        by the all-exec first frame; policy state persists across clips like
        the reference's policy module attributes)."""
        # zeros_like: also valid for mesh-stacked states, where frame_idx
        # carries a leading device axis
        return {**state, "frame_idx": jnp.zeros_like(state["frame_idx"])}

    # -- internals ----------------------------------------------------------

    def _run_model(self, params, state, frame, idx):
        n, gh, gw = self.geom
        pack = split_dense(frame, idx, n, gh, gw)
        ctx = ExecCtx.blocked(idx, n, gh, gw, dict(state["canvases"]))
        self._store_frame_state(ctx, pack)
        task = self._model_fn(params, pack, ctx)
        return ctx.canvases, task

    def _sample_grid(self, key, probs):
        """Bernoulli sample then round to exactly ``capacity`` blocks: keep
        sampled blocks (ranked by prob-break random), fill with the highest-
        scoring unsampled ones.  The REINFORCE log-prob is taken of the final
        grid — same semantics as the reference's quantize-then-log_prob
        (``policy/policy.py:286-296``)."""
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, probs.shape)
        sampled = (u < probs).astype(jnp.float32)
        flat = sampled.reshape(-1)
        scores = jax.random.uniform(k2, flat.shape) + 2.0 * flat
        order = jnp.argsort(-scores)
        rank = jnp.zeros_like(flat, jnp.int32).at[order].set(
            jnp.arange(flat.shape[0], dtype=jnp.int32)
        )
        grid = (rank < self.capacity).reshape(probs.shape)
        return grid

    def _policy_optim(self, state, grid_f, cache_x, psum_axis: Optional[str]):
        """REINFORCE update (lax.cond'd on the train interval).

        The backward re-traces the policy forward inside the cond; a
        ``jax.vjp`` residual-reuse restructure was measured SLOWER
        end-to-end (residual storage taxes every frame while the backward
        runs only every ``train_interval`` frames — see the NOTE in
        ``step``)."""
        cfg = self.cfg
        pol = state["policy"]
        perc = grid_f.mean()
        rc = pol["running_cost"]
        rc = jnp.where(rc < 0, perc, rc)
        rc = rc * cfg.cost_momentum + (1 - cfg.cost_momentum) * perc
        reward_c = -(rc - cfg.block_target)
        reward_c = reward_c * jnp.abs(reward_c) * cfg.complexity_weight

        def do_train(operand):
            params, opt = operand
            # reward_c is a scalar, so pooling the IG alone and adding it
            # after is exactly max(ig + c) per block
            reward_grid = self._reward_grid(state) + reward_c
            signed = jnp.where(grid_f > 0, reward_grid, -reward_grid)
            signed = jax.lax.stop_gradient(signed)

            def loss_fn(p):
                lg, _ = policy_net_apply(p, pol["bn_state"], cache_x,
                                         update_stats=False,
                                         arch=self.cfg.policy_arch)
                l = lg[..., 0]
                logp = grid_f * jax.nn.log_sigmoid(l) \
                    + (1 - grid_f) * jax.nn.log_sigmoid(-l)
                return jnp.mean(-logp * signed)

            grads = jax.grad(loss_fn)(params)
            if psum_axis is not None:
                grads = jax.lax.pmean(grads, psum_axis)
            return rmsprop.update(grads, opt, params, lr=cfg.lr,
                                  weight_decay=cfg.weight_decay,
                                  momentum=cfg.momentum)

        train = (state["frame_idx"] % cfg.train_interval == 0) \
            & (state["frame_idx"] >= 2)
        params, opt = jax.lax.cond(
            train, do_train, lambda o: o, (pol["params"], pol["opt"])
        )
        return {**pol, "params": params, "opt": opt, "running_cost": rc}

    # -- steps --------------------------------------------------------------

    def first_step(self, model_params, state, frame):
        """Frame 1 of a clip: execute everything (capacity == total)."""
        n, gh, gw = self.geom
        idx = jnp.arange(self.total, dtype=jnp.int32)
        canvases, task = self._run_model(model_params, state, frame, idx)
        pol = dict(state["policy"])
        rc = pol["running_cost"]
        rc = jnp.where(rc < 0, 1.0, rc)
        pol["running_cost"] = rc * self.cfg.cost_momentum \
            + (1 - self.cfg.cost_momentum) * 1.0
        new = {
            **state,
            "canvases": canvases,
            "prev_grid": jnp.ones((n, gh, gw), jnp.float32),
            "frame_idx": jnp.int32(1),
            "policy": pol,
        }
        for k in self.task_keys:
            new[k] = task[k]
            new[f"{k}_prev"] = task[k]
        return new

    def step(self, model_params, state, frame, psum_axis: Optional[str] = None):
        """Steady-state frame: sample grid, run ``capacity`` blocks, update
        the policy.  Pure function of (params, state, frame)."""
        n, gh, gw = self.geom
        pol = state["policy"]
        key, k_use = jax.random.split(pol["key"])

        frame_state_prev = state["canvases"][FRAME_STATE]
        fs_dense = block_layout_to_dense(frame_state_prev, n, gh, gw)
        if (self.cfg.policy_arch == "fast" and _polnet.POLICY_SPLIT_STEM
                and _polnet.POLICY_STEM_CONV4):
            # per-source stem convs; the 26-ch concat never materializes
            cache_x = assemble_policy_input_split(
                frame, fs_dense, self._output_repr(state),
                state["prev_grid"], self.cfg.block_size)
        else:
            cache_x = assemble_policy_input(
                frame, fs_dense, self._output_repr(state), state["prev_grid"],
                self.cfg.block_size,
                # fast arch: bf16 assembly (convs run bf16 anyway; halves the
                # input-assembly and space-to-depth bytes); ref arch stays fp32
                dtype=jnp.bfloat16 if self.cfg.policy_arch == "fast"
                else jnp.float32,
            )

        # NOTE: a jax.vjp restructure (reuse this forward's residuals for the
        # REINFORCE backward) was measured SLOWER end-to-end (95.7 vs ~140
        # FPS): residual storage taxes every frame's forward while the
        # backward only runs every train_interval frames.  The backward
        # recomputes its own forward inside the lax.cond instead.
        logits, bn_state = policy_net_apply(pol["params"], pol["bn_state"],
                                            cache_x, update_stats=True,
                                            arch=self.cfg.policy_arch)
        probs = jax.nn.sigmoid(logits[..., 0])
        grid = self._sample_grid(k_use, probs)
        grid_f = grid.astype(jnp.float32)
        idx = gridlib.exec_indices(grid, self.capacity)

        canvases, task = self._run_model(model_params, state, frame, idx)

        mid = {
            **state,
            "canvases": canvases,
            "prev_grid": grid_f,
            "frame_idx": state["frame_idx"] + 1,
            "policy": {**pol, "bn_state": bn_state, "key": key},
        }
        for k in self.task_keys:
            mid[k] = task[k]
            mid[f"{k}_prev"] = state[k]
        new_policy = self._policy_optim(mid, grid_f, cache_x, psum_axis)
        return {**mid, "policy": new_policy}
