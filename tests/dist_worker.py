"""Worker process for the REAL 2-process jax.distributed test.

Launched by tests/test_distributed.py::TestRealTwoProcess with the
torch-style env contract (MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK — the
reference's pytorch launcher contract, ``Pedestron/mmdet/apis/env.py:
22-29``).  Each process contributes ONE CPU device; together they form a
2-device global mesh and run one clip-parallel first_step + step (with a
pmean'd REINFORCE update, train_interval=1).  The worker prints a sha256
digest of its rank's policy-param lane; the parent asserts both ranks
print the SAME digest — the cross-process proof that the pmean kept the
replicated policy in sync.

NOT imported by pytest (no test_ prefix); run as ``python dist_worker.py``.
"""

import hashlib
import os
import sys

# one local CPU device per process -> 2 global devices across the pair
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon TPU

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
    from blockcopy_tpu.models.swiftnet import (
        SwiftNetConfig, init_swiftnet, make_apply_fn)
    from blockcopy_tpu.parallel import clip_parallel, distributed

    # the REAL coordinator handshake (unmocked)
    assert distributed.maybe_initialize() is True
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    rank = jax.process_index()

    mesh = distributed.global_mesh(2)
    lo, hi = distributed.local_batch_slice(2)
    assert (lo, hi) == (rank, rank + 1)

    cfg = SwiftNetConfig(backbone="resnet18", num_classes=19)
    params = init_swiftnet(jax.random.PRNGKey(0), cfg)
    frame_shape = (1, 128, 256, 3)
    scfg = StepperConfig(block_size=64, train_interval=1)
    stepper = FixedCapacityStepper(make_apply_fn(cfg), scfg, frame_shape,
                                   capacity=4)

    # Same init key on both ranks -> identical replicated start; only the
    # per-lane sampling keys differ (split deterministically, each rank
    # keeps its slice) — the multi-process analog of init_parallel_state.
    k_init, k_samp = jax.random.split(jax.random.PRNGKey(4))
    base = stepper.init_state(params, k_init)
    local = jax.tree.map(lambda x: np.asarray(x)[None], base)
    local["policy"]["key"] = np.asarray(
        jax.random.split(k_samp, 2))[lo:hi]
    lane_sharding = NamedSharding(mesh, P(clip_parallel.AXIS))

    def to_global(x):
        return jax.make_array_from_process_local_data(lane_sharding, x)

    state = jax.tree.map(to_global, local)

    rs = np.random.RandomState(5)
    fall = rs.randn(2, *frame_shape).astype(np.float32)  # same on both ranks

    def frames_global(arr):
        return jax.make_array_from_process_local_data(lane_sharding,
                                                      arr[lo:hi])

    first, step = clip_parallel.build_parallel_steps(stepper, mesh)
    state = first(params, state, frames_global(fall))
    fall2 = rs.randn(2, *frame_shape).astype(np.float32)
    state = step(params, state, frames_global(fall2))  # trains + pmean

    w = state["policy"]["params"]["conv1"]["w"]
    shard = np.asarray(w.addressable_shards[0].data)  # this rank's lane
    out = np.asarray(
        state["outputs"].addressable_shards[0].data)
    assert np.isfinite(out).all()
    digest = hashlib.sha256(shard.tobytes()).hexdigest()
    print(f"RANK{rank} POLICY_DIGEST {digest}", flush=True)


if __name__ == "__main__":
    main()
