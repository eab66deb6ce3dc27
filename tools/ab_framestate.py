"""Same-process A/B: quarter-res frame-state canvas vs full-res store_dense.
Cross-process bench numbers vary ~±6% on the relay; only a same-process A/B
is trustworthy for this delta."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(stepper_cls_patch, label, reps=2, frames=50):
    from blockcopy_tpu.core.stepper import FixedCapacityStepper, StepperConfig
    from blockcopy_tpu.models.swiftnet import (
        SwiftNetConfig, init_swiftnet, make_apply_fn)

    h, w = 1024, 2048
    cfg = SwiftNetConfig(backbone="resnet50", num_classes=19)
    params = init_swiftnet(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    scfg = StepperConfig(block_size=128, train_interval=4)
    st = FixedCapacityStepper(make_apply_fn(cfg), scfg, (1, h, w, 3),
                              capacity=64, dtype=jnp.bfloat16)
    if stepper_cls_patch:
        stepper_cls_patch(st)
    state = st.init_state(params, jax.random.PRNGKey(1))
    first = jax.jit(st.first_step, donate_argnums=(1,))
    step = jax.jit(st.step, donate_argnums=(1,))
    rs = np.random.RandomState(0)
    staged = [jax.device_put(jnp.asarray(
        rs.randn(1, h, w, 3).astype(np.float32), jnp.bfloat16))
        for _ in range(3)]
    state = first(params, state, staged[0])
    for t in range(5):
        state = step(params, state, staged[t % 3])
    float(jnp.sum(state["outputs"].astype(jnp.float32)))
    for rep in range(reps):
        t0 = time.perf_counter()
        for t in range(frames):
            state = step(params, state, staged[t % 3])
        float(jnp.sum(state["outputs"].astype(jnp.float32)))
        fps = frames / (time.perf_counter() - t0)
        print(json.dumps({"variant": f"{label}_rep{rep}",
                          "fps": round(fps, 2)}), flush=True)


def patch_fullres(st):
    """Restore the round-1 behavior: full-res frame-state store_dense."""
    from blockcopy_tpu.core.stepper import FRAME_STATE

    def store(ctx, pack):
        ctx.store_dense(FRAME_STATE, pack)
    st._store_frame_state = store


def main():
    run(None, "quarter")
    run(patch_fullres, "fullres")
    run(None, "quarter_again")


if __name__ == "__main__":
    main()
