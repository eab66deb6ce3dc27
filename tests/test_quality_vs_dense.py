"""Quality proxy without datasets: on a synthetic moving scene, BlockCopy at
~50% execution must stay close to the per-frame dense model (argmax
agreement), and far above a frozen-frame baseline.  This is the testable
core of the reference's headline claim (76.3 vs 77.6 mIoU at half the
compute)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blockcopy_tpu import BlockCopyModel
from blockcopy_tpu.core.argparser import default_settings
from blockcopy_tpu.core.blocked import ExecCtx
from blockcopy_tpu.models.swiftnet import (
    SwiftNetConfig,
    init_swiftnet,
    make_apply_fn,
    swiftnet_apply,
)

CFG = SwiftNetConfig(backbone="resnet18")
H, W, BS = 256, 512, 128


def moving_clip(frames=6, seed=0):
    rs = np.random.RandomState(seed)
    base = rs.randn(1, H, W, 3).astype(np.float32)
    clip = []
    for t in range(frames):
        f = base.copy()
        f[:, :, 40 * t: 40 * t + 80] += 2.0  # moving vertical band
        clip.append(jnp.asarray(f))
    return clip


def test_blockcopy_tracks_dense_under_motion():
    params = init_swiftnet(jax.random.PRNGKey(0), CFG)
    model = BlockCopyModel(
        make_apply_fn(CFG), params,
        default_settings(block_policy="random", block_size=BS,
                         block_quantize_number_exec=0.5),
    )
    dense = jax.jit(lambda x: swiftnet_apply(params, x, ExecCtx.dense(), CFG))
    model.reset_temporal()
    clip = moving_clip(6)
    agree_bc, agree_frozen = [], []
    out_first = None
    for t, f in enumerate(clip):
        out_bc = np.asarray(jnp.argmax(model(f), -1))
        out_dense = np.asarray(jnp.argmax(dense(f), -1))
        if t == 0:
            out_first = out_dense
        agree_bc.append((out_bc == out_dense).mean())
        agree_frozen.append((out_first == out_dense).mean())
    # skip frames 1-2 (all-exec by construction)
    bc = float(np.mean(agree_bc[2:]))
    frozen = float(np.mean(agree_frozen[2:]))
    # partial execution must track dense far better than freezing frame 1
    # (measured margin 0.11 at this scene amplitude — gate at 0.08 so the
    # proxy stays discriminative, not vacuously satisfiable)
    assert bc > frozen + 0.08, (bc, frozen)
    assert bc > 0.75, bc
