"""CSP detector training CLI.

End-to-end offline training (the reference's inherited stack: losses
``csp_head.py:332-416``, runner ``mean_teacher_runner.py``, launcher
``apis/train.py:19-100``): dataset -> augment + GT maps -> jitted
``train_step`` (Adam + step LR + warmup + mean-teacher EMA) -> per-epoch
checkpoints.  Checkpoints are ``.npz`` parameter pytrees directly loadable
by the detection eval CLI (``--checkpoint epoch_N[_teacher].npz``); the
teacher export plays the role of the reference's ``.pth.stu`` mean-teacher
weights.

Run:  python -m blockcopy_tpu.tasks.detection.train_cli --synthetic \
          --epochs 2 --steps-per-epoch 20 --out /tmp/csp_train
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from blockcopy_tpu.data.loader import PrefetchLoader
from blockcopy_tpu.models.csp import CSPConfig, init_csp
from blockcopy_tpu.tasks.detection.train import (
    TrainConfig,
    init_train_state,
    make_train_step,
)
from blockcopy_tpu.tasks.detection.train_dataset import (
    CSPTrainTransform,
    CityPersonsTrainDataset,
    SyntheticDetTrainDataset,
)
from blockcopy_tpu.utils.checkpoint import load_npz, save_params

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("blockcopy_tpu.detection.train")


def build_argparser():
    p = argparse.ArgumentParser(description="BlockCopy-TPU CSP training")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--ann-file", type=str, default="")
    p.add_argument("--img-prefix", type=str, default="")
    p.add_argument("--crop-height", type=int, default=640)
    p.add_argument("--crop-width", type=int, default=1280)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps-per-epoch", type=int, default=0,
                   help="0 = one pass over the dataset per epoch")
    p.add_argument("--num-samples", type=int, default=64,
                   help="synthetic dataset size")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup-iters", type=int, default=500)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="work_dirs/csp")
    p.add_argument("--resume", type=str, default="",
                   help="npz full train state to resume from")
    p.add_argument("--log-interval", type=int, default=10)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    transform = CSPTrainTransform(
        crop_size=(args.crop_height, args.crop_width), seed=args.seed)
    if args.synthetic:
        dataset = SyntheticDetTrainDataset(
            args.num_samples, args.crop_height, args.crop_width,
            seed=args.seed, transform=transform)
    elif args.ann_file:
        dataset = CityPersonsTrainDataset(args.ann_file, args.img_prefix,
                                          transform)
    else:
        raise AttributeError("need --synthetic or --ann-file/--img-prefix")

    csp_cfg = CSPConfig()
    # iters_per_epoch counts OPTIMIZER steps (the unit `step` advances in),
    # i.e. full batches per pass — not dataset samples
    tcfg = TrainConfig(lr=args.lr, warmup_iters=args.warmup_iters,
                       iters_per_epoch=args.steps_per_epoch
                       or max(1, len(dataset) // args.batch_size))
    params = init_csp(jax.random.PRNGKey(args.seed), csp_cfg)
    state = init_train_state(params, tcfg)
    if args.resume and os.path.isfile(args.resume):
        state = load_npz(args.resume, state)
        logger.info("resumed from %s (step %d)", args.resume,
                    int(state["step"]))
    train_step = jax.jit(make_train_step(csp_cfg, tcfg),
                         donate_argnums=(0,))

    class _Shuffled:
        """Per-epoch random sample order (the reference trains with a
        shuffling sampler); also means --steps-per-epoch sees a different
        prefix each epoch instead of replaying samples 0..N forever."""

        def __init__(self, order):
            self.order = order

        def __len__(self):
            return len(dataset)

        def __getitem__(self, i):
            return dataset[int(self.order[i])]

    def batches(epoch_seed):
        order = np.random.RandomState(args.seed + 7919 * epoch_seed) \
            .permutation(len(dataset))
        loader = PrefetchLoader(_Shuffled(order), num_workers=args.workers)
        group = []
        for item in loader:
            group.append(item)
            if len(group) == args.batch_size:
                imgs = jnp.asarray(np.stack([g[0] for g in group]))
                maps = tuple(
                    jnp.asarray(np.stack([g[1 + i] for g in group]))
                    for i in range(3))
                yield imgs, maps
                group = []

    history = []
    first_losses = None
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        n_steps = 0
        last = {}
        losses = None
        for imgs, gt_maps in batches(epoch):
            state, losses = train_step(state, imgs, gt_maps)
            n_steps += 1
            if n_steps % args.log_interval == 0 or n_steps == 1:
                last = {k: float(v) for k, v in losses.items()}
                logger.info("epoch %d step %d: %s", epoch + 1, n_steps,
                            {k: round(v, 4) for k, v in last.items()})
                if first_losses is None:
                    first_losses = last
            if args.steps_per_epoch and n_steps >= args.steps_per_epoch:
                break
        if losses is None:
            raise RuntimeError(
                f"epoch {epoch + 1}: no full batch produced — dataset has "
                f"{len(dataset)} samples for --batch-size {args.batch_size}")
        if not last:
            last = {k: float(v) for k, v in losses.items()}
        history.append(last)
        dt = time.perf_counter() - t0
        # checkpoints: student + mean-teacher (reference's .pth.stu role),
        # both eval-CLI-loadable, plus the full state for resume
        ep = epoch + 1
        save_params(os.path.join(args.out, f"epoch_{ep}.npz"),
                    state["params"])
        save_params(os.path.join(args.out, f"epoch_{ep}_teacher.npz"),
                    state["ema_params"])
        save_params(os.path.join(args.out, "latest_state.npz"), state)
        logger.info("epoch %d done (%d steps, %.1fs): checkpoints saved "
                    "under %s", ep, n_steps, dt, args.out)

    result = {"epochs": args.epochs, "final_losses": history[-1],
              "first_losses": first_losses, "out": args.out,
              "step": int(state["step"])}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
