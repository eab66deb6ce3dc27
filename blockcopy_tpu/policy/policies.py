"""Execution policies: which blocks run this frame.

Port of the reference policy subsystem (``blockcopy/blockcopy/policy/
policy.py``) redesigned for the TPU execution model:

* grids are sampled **on device inside jit** with ``jax.random`` (the
  reference round-trips the grid to the CPU and uses ``random.sample``,
  ``policy.py:124-144``);
* the REINFORCE update is a jitted ``jax.grad`` step over the policy-only
  loss; the policy runs float32 while the task model runs bfloat16;
* the scalar running-cost EMA lives on the host (one scalar per frame — the
  engine already syncs the block count to pick a compiled capacity).

``policy_meta`` carries the same keys as the reference: ``inputs``,
``outputs``, ``outputs_prev``, ``frame_state``, ``grid``, ``num_exec``,
``num_total``, ``perc_exec``, ``output_repr``, ``information_gain``.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blockcopy_tpu.core import grid as gridlib
from blockcopy_tpu.ops.layers import adaptive_max_pool2d
from blockcopy_tpu.policy import optim as rmsprop
from blockcopy_tpu.policy.information_gain import (
    semseg_information_gain,
    semseg_output_repr,
)
from blockcopy_tpu.policy.net import (
    assemble_policy_input,
    init_policy_net,
    policy_in_channels,
    policy_net_apply,
)

logger = logging.getLogger(__name__)


def build_policy_from_settings(settings: dict):
    """Reference parity: ``build_policy_from_settings``
    (``policy/policy.py:14-56``)."""
    name = settings["block_policy"]
    logger.info(
        "> Policy: %s with execution percentage target %s and block size %s",
        name, settings.get("block_target"), settings["block_size"],
    )
    quantum = settings.get("block_quantize_number_exec", 1.0 / 16.0)
    verbose = settings.get("block_policy_verbose", False)
    bs = settings["block_size"]
    if name == "all":
        return PolicyAll(block_size=bs, verbose=verbose)
    if name == "none":
        return PolicyNone(block_size=bs, verbose=verbose)
    if name == "random":
        return PolicyRandom(block_size=bs, verbose=verbose, quantize=quantum,
                            seed=settings.get("block_seed", 0))
    if name.startswith("rl_"):
        if name == "rl_semseg":
            ig = SemsegInformationGain(num_classes=settings["block_num_classes"])
        elif name == "rl_objectdetection":
            from blockcopy_tpu.tasks.detection.information_gain import (
                DetectionInformationGain,
            )
            ig = DetectionInformationGain(num_classes=settings["block_num_classes"])
        else:
            raise AttributeError(f'Policy with name "{name}" not defined!')
        return PolicyTrainRL(
            block_size=bs,
            block_target=settings["block_target"],
            cost_momentum=settings["block_cost_momentum"],
            lr=settings["block_optim_lr"],
            weight_decay=settings["block_optim_wd"],
            momentum=settings["block_optim_momentum"],
            complexity_weight=settings["block_complexity_weight"],
            num_classes=settings["block_num_classes"],
            quantize=quantum,
            information_gain=ig,
            verbose=verbose,
            seed=settings.get("block_seed", 0),
            arch=settings.get("block_policy_arch", "ref"),
        )
    raise NotImplementedError(f"Policy {name} not implemented")


class PolicyStats:
    """Average executed-block accounting (reference ``policy.py:72-100``)."""

    def __init__(self):
        self.count_images = 0
        self.exec = 0
        self.total = 0

    def add_policy_meta(self, policy_meta: dict, num_exec: int) -> dict:
        grid = policy_meta["grid"]
        num_total = int(np.prod(grid.shape))
        policy_meta["num_exec"] = num_exec
        policy_meta["num_total"] = num_total
        policy_meta["perc_exec"] = float(num_exec) / num_total
        self.count_images += grid.shape[0]
        self.exec += num_exec
        self.total += num_total
        return policy_meta

    def get_exec_percentage(self) -> float:
        return float(self.exec) / max(self.total, 1)

    def __repr__(self):
        return (
            "Policy stats: average exec percentage [0 - 1] : "
            f"{self.get_exec_percentage():0.3f}"
        )


class Policy:
    """Abstract policy (reference ``policy.py:103-157``)."""

    def __init__(self, block_size: int, verbose: bool = False,
                 quantize: float = 0.0, seed: int = 0):
        self.block_size = block_size
        self.verbose = verbose
        self.quantize = quantize
        self.stats = PolicyStats()
        self.key = jax.random.PRNGKey(seed)
        self.net_params = None  # trainable policies override

    def is_trainable(self) -> bool:
        return self.net_params is not None

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _grid_geometry(self, inputs):
        n, h, w, _ = inputs.shape
        gh, gw = gridlib.grid_shape(h, w, self.block_size)
        return n, gh, gw

    def _finalize(self, policy_meta: dict, grid) -> dict:
        policy_meta["grid"] = grid
        num_exec = int(jax.device_get(jnp.sum(grid)))
        return self.stats.add_policy_meta(policy_meta, num_exec)

    def forward(self, policy_meta: dict) -> dict:
        raise NotImplementedError

    def __call__(self, policy_meta: dict) -> dict:
        return self.forward(policy_meta)

    def optim(self, policy_meta: dict, train: bool = True) -> dict:
        return policy_meta

    def state(self) -> dict:
        """Checkpointable policy state (improvement over the reference, which
        never persists the online policy — ``SURVEY.md §5``)."""
        return {}

    def load_state(self, state: dict) -> None:
        pass


class PolicyAll(Policy):
    """Execute every block (dense oracle, reference ``policy.py:160-174``)."""

    def forward(self, policy_meta: dict) -> dict:
        n, gh, gw = self._grid_geometry(policy_meta["inputs"])
        grid = jnp.ones((n, gh, gw), dtype=bool)
        return self._finalize(policy_meta, grid)


class PolicyNone(Policy):
    """Execute everything on frame 1, nothing afterwards
    (reference ``policy.py:177-192``)."""

    def forward(self, policy_meta: dict) -> dict:
        n, gh, gw = self._grid_geometry(policy_meta["inputs"])
        first = policy_meta.get("outputs_prev", None) is None
        grid = jnp.full((n, gh, gw), first, dtype=bool)
        return self._finalize(policy_meta, grid)


class PolicyRandom(Policy):
    """All blocks on frame 1, Bernoulli(0.5) + quantization afterwards
    (reference ``policy.py:195-216``)."""

    def forward(self, policy_meta: dict) -> dict:
        n, gh, gw = self._grid_geometry(policy_meta["inputs"])
        if policy_meta.get("outputs_prev", None) is None:
            grid = jnp.ones((n, gh, gw), dtype=bool)
        else:
            k1, k2 = jax.random.split(self._next_key())
            grid = jax.random.normal(k1, (n, gh, gw)) > 0
            grid = gridlib.quantize_grid(k2, grid, self.quantize)
        return self._finalize(policy_meta, grid)


class SemsegInformationGain:
    """Strategy object: in-jit KL information gain for segmentation."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self._compute = jax.jit(semseg_information_gain)

    def get_output_repr(self, policy_meta: dict):
        return semseg_output_repr(policy_meta["outputs"])

    def compute(self, policy_meta: dict):
        return self._compute(policy_meta["outputs"], policy_meta["outputs_prev"])


class PolicyTrainRL(Policy):
    """Online-REINFORCE policy (reference ``policy.py:219-370``).

    Per frame: policy-net forward + Bernoulli sampling + count quantization in
    one jitted program; every ``train_interval`` frames a jitted REINFORCE
    step (information gain + complexity reward, signed for skipped blocks,
    ``loss = -log_prob * reward``) updates the net with torch-exact RMSprop.
    """

    def __init__(self, block_size, block_target, cost_momentum, lr,
                 weight_decay, momentum, complexity_weight, num_classes,
                 information_gain, quantize=1.0 / 16.0, at_least_one=False,
                 verbose=False, seed=0, arch="ref"):
        super().__init__(block_size, verbose, quantize, seed)
        assert 0.0 <= block_target <= 1.0
        self.block_target = block_target
        self.cost_momentum = cost_momentum
        self.lr = lr
        self.weight_decay = weight_decay
        self.momentum = momentum
        self.complexity_weight_gamma = complexity_weight
        self.num_classes = num_classes
        self.information_gain = information_gain
        self.at_least_one = at_least_one
        self.arch = arch
        self.running_cost: Optional[float] = None

        # fast arch: logit head bias starts at logit(target) so sampling
        # opens AT the execution target — at target 0.5 this is exactly the
        # pre-r5 zero init (see _init_policy_net_fast); the ref arch keeps
        # the reference's own init for parity.
        t = min(max(block_target, 1e-3), 1 - 1e-3)
        head_bias = float(np.log(t / (1.0 - t))) if arch == "fast" else 0.0
        self.net_params, self.bn_state = init_policy_net(
            self._next_key(), policy_in_channels(num_classes), arch=arch,
            head_bias=head_bias,
        )
        self.opt_state = rmsprop.init(self.net_params)
        self._forward_jit = jax.jit(self._forward_impl)
        self._optim_jit = jax.jit(self._optim_impl)

    # -- jitted bodies ------------------------------------------------------

    def _forward_impl(self, params, bn_state, key, frame, frame_state,
                      output_repr, prev_grid):
        x = assemble_policy_input(frame, frame_state, output_repr, prev_grid,
                                  self.block_size)
        logits, new_bn_state = policy_net_apply(params, bn_state, x,
                                                update_stats=True,
                                                arch=self.arch)
        k1, k2 = jax.random.split(key)
        probs = jax.nn.sigmoid(logits[..., 0])
        u = jax.random.uniform(k1, probs.shape)
        grid = u < probs
        if self.at_least_one:
            # if nothing sampled, force a single block (reference policy.py:289-291)
            grid = grid.at[0, 0, 0].set(grid[0, 0, 0] | ~grid.any())
        grid = gridlib.quantize_grid(k2, grid, self.quantize)
        exec_prob = jnp.where(grid, probs, 0).sum() / jnp.maximum(grid.sum(), 1)
        skip_prob = jnp.where(grid, 0, probs).sum() / jnp.maximum((~grid).sum(), 1)
        return grid, x, new_bn_state, exec_prob, skip_prob

    def _optim_impl(self, params, bn_state, opt_state, cache_x, grid, ig,
                    reward_complexity_weighted):
        gh, gw = grid.shape[1], grid.shape[2]
        reward = ig + reward_complexity_weighted  # (N, h, w, 1) fp32
        reward_grid = adaptive_max_pool2d(reward, (gh, gw))[..., 0]
        signed = jnp.where(grid, reward_grid, -reward_grid)
        signed = jax.lax.stop_gradient(signed)

        def loss_fn(p):
            logits, _ = policy_net_apply(p, bn_state, cache_x,
                                         update_stats=False, arch=self.arch)
            l = logits[..., 0]
            g = grid.astype(jnp.float32)
            log_probs = g * jax.nn.log_sigmoid(l) + (1 - g) * jax.nn.log_sigmoid(-l)
            return jnp.mean(-log_probs * signed)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params, new_opt = rmsprop.update(
            grads, opt_state, params, lr=self.lr,
            weight_decay=self.weight_decay, momentum=self.momentum,
        )
        return new_params, new_opt, loss

    # -- host API -----------------------------------------------------------

    def forward(self, policy_meta: dict) -> dict:
        inputs = policy_meta["inputs"]
        n, gh, gw = self._grid_geometry(inputs)
        if policy_meta.get("outputs", None) is None:
            # no temporal history: execute everything (reference policy.py:270-274)
            grid = jnp.ones((n, gh, gw), dtype=bool)
            policy_meta["_rl_cache"] = None
        else:
            grid, cache_x, self.bn_state, exec_p, skip_p = self._forward_jit(
                self.net_params, self.bn_state, self._next_key(), inputs,
                policy_meta["frame_state"], policy_meta["output_repr"],
                policy_meta["grid"].astype(jnp.float32),
            )
            if self.verbose:
                # NaN guard (reference policy.py:281-283); only when verbose
                # so the hot path stays sync-free
                assert bool(jnp.isfinite(exec_p) & jnp.isfinite(skip_p)), \
                    "Policy net returned NaN's, maybe optimization problem?"
            policy_meta["_rl_cache"] = cache_x
            policy_meta["_rl_probs"] = (exec_p, skip_p)
        return self._finalize(policy_meta, grid)

    def optim(self, policy_meta: dict, train: bool = True) -> dict:
        policy_meta["output_repr"] = self.information_gain.get_output_repr(
            policy_meta
        )
        block_use = policy_meta["perc_exec"]
        if self.running_cost is None:
            self.running_cost = block_use
        self.running_cost = (
            self.running_cost * self.cost_momentum
            + (1 - self.cost_momentum) * block_use
        )
        if (
            policy_meta.get("outputs_prev", None) is not None
            and train
            and policy_meta.get("_rl_cache", None) is not None
        ):
            ig = self.information_gain.compute(policy_meta)
            policy_meta["information_gain"] = ig
            rc = -(self.running_cost - self.block_target)
            rc = rc * abs(rc)
            rcw = rc * self.complexity_weight_gamma
            self.net_params, self.opt_state, loss = self._optim_jit(
                self.net_params, self.bn_state, self.opt_state,
                policy_meta["_rl_cache"], policy_meta["grid"],
                ig.astype(jnp.float32), jnp.float32(rcw),
            )
            if self.verbose:
                exec_p, skip_p = (
                    float(x) for x in jax.device_get(policy_meta["_rl_probs"])
                )
                print(
                    f"BLOCKS/running_cost: {self.running_cost: 0.3f}\n"
                    f"BLOCKS/block_use: {block_use:0.3f}\n"
                    f"BLOCKS/reward_complexity_weighted: {rcw}\n"
                    f"BLOCKS/avg_prob_exec: {exec_p:0.3f}\n"
                    f"BLOCKS/avg_prob_skip: {skip_p:0.3f}\n"
                )
                print(self.stats)
            if self.stats.count_images > 300 and "_rl_probs" in policy_meta:
                exec_p, skip_p = (
                    float(x) for x in jax.device_get(policy_meta["_rl_probs"])
                )
                if exec_p - skip_p < 0.3:
                    logger.warning(
                        "Block execution policy seems not well trained yet."
                    )
        return policy_meta

    def state(self) -> dict:
        return {
            "net_params": self.net_params,
            "bn_state": self.bn_state,
            "opt_state": self.opt_state,
            "running_cost": self.running_cost,
            "key": self.key,
        }

    def load_state(self, state: dict) -> None:
        self.net_params = state["net_params"]
        self.bn_state = state["bn_state"]
        self.opt_state = state["opt_state"]
        self.running_cost = state["running_cost"]
        self.key = state["key"]
