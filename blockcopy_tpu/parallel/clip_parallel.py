"""Clip-level data parallelism over a TPU mesh.

The reference is single-GPU only (its DDP plumbing is dead code:
``tools/test_city_person.py:334`` raises for distributed; SURVEY.md §2.5).
The TPU-native scale-out axis is the clip: temporal state is per-clip
(reference ``BlockCopyModel.reset_temporal``, ``core/blockcopy.py:34-43``),
so D devices step D independent clips in SPMD, and the one shared component —
the online policy — is kept in sync by ``pmean``-ing its REINFORCE gradients
over the mesh (an improvement over the reference: the policy learns from all
clips at once).

Implementation: the fixed-capacity stepper state is stacked with a leading
device axis and sharded over ``Mesh('data')`` with ``shard_map``; model
parameters are replicated.  Collectives ride ICI; there is no host
participation after dispatch.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from blockcopy_tpu.core.stepper import FixedCapacityStepper

AXIS = "data"


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # silent truncation would shard D-stacked state over fewer
            # devices and drop clips without any error downstream
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} "
                f"available")
        devices = devices[:n_devices]
    return Mesh(devices, axis_names=(AXIS,))


def init_parallel_state(stepper: FixedCapacityStepper, model_params, key,
                        n_devices: int) -> dict:
    """One replicated state: policy params/optimizer start IDENTICAL on
    every device (they stay in sync because gradients are pmean'd), while
    the per-device sampling keys differ so each clip explores its own
    grids."""
    k_init, k_samp = jax.random.split(key)
    base = stepper.init_state(model_params, k_init)
    state = jax.tree.map(lambda x: jnp.stack([x] * n_devices), base)
    state["policy"] = {**state["policy"],
                       "key": jax.random.split(k_samp, n_devices)}
    return state


def build_parallel_steps(stepper: FixedCapacityStepper, mesh: Mesh):
    """Returns jitted (first_step, step) over the mesh.

    Signature: ``fn(model_params, state_batched, frames_batched)`` where
    batched leaves carry a leading device axis of size ``len(mesh)`` and
    frames are ``(D, N, H, W, 3)``.
    """

    def _wrap(fn):
        def shard_fn(params, state, frames):
            s = jax.tree.map(lambda x: x[0], state)
            out = fn(params, s, frames[0])
            return jax.tree.map(lambda x: jnp.asarray(x)[None], out)

        sharded = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(AXIS), P(AXIS)),
            out_specs=P(AXIS),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(1,))

    first = _wrap(lambda p, s, f: stepper.first_step(p, s, f))
    step = _wrap(lambda p, s, f: stepper.step(p, s, f, psum_axis=AXIS))
    return first, step
