"""SwiftNet + BlockCopy evaluation CLI.

Mirrors the reference driver ``semantic_segmentation/test_swiftnet.py`` flag
for flag: dataset setup (Cityscapes-seq clips / demo folder / synthetic),
model build + checkpoint load, BlockCopy wrap (unless ``--block-policy
static``), two-phase warmup->eval loop with per-clip temporal reset,
streaming mIoU, FPS, analytic GMACs, and visualization dumps.

Run:  python -m blockcopy_tpu.tasks.semseg.eval --synthetic --num-clips-warmup 2 ...
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import os.path as osp
import time

import jax
import jax.numpy as jnp
import numpy as np

import blockcopy_tpu
from blockcopy_tpu.core.argparser import add_argparser_arguments
from blockcopy_tpu.data import transforms as et
from blockcopy_tpu.data.cityscapes_vid import CityscapesVid
from blockcopy_tpu.data.demo import DemoImageDataset
from blockcopy_tpu.data.loader import PrefetchLoader
from blockcopy_tpu.models.swiftnet import (
    SwiftNetConfig,
    init_swiftnet,
    make_apply_fn,
    swiftnet_apply,
)
from blockcopy_tpu.core.blocked import ExecCtx
from blockcopy_tpu.ops.layers import resize_bilinear
from blockcopy_tpu.utils.checkpoint import load_params
from blockcopy_tpu.utils.metrics import StreamSegMetrics
from blockcopy_tpu.utils.profiler import timings

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("blockcopy_tpu.semseg")


class SyntheticClipDataset:
    """Deterministic synthetic video clips (moving bright square over a fixed
    background) with self-consistent labels, for data-free runs."""

    def __init__(self, num_clips, clip_length, height, width, num_classes=19,
                 seed=0):
        self.num_clips = num_clips
        self.clip_length = clip_length
        self.h, self.w = height, width
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self):
        return self.num_clips

    def __getitem__(self, index):
        rs = np.random.RandomState(self.seed + index)
        base = rs.randn(self.h, self.w, 3).astype(np.float32)
        clip = []
        for t in range(self.clip_length):
            f = base.copy()
            s = (47 * (index + t)) % max(self.h - 200, 1)
            f[s : s + 160, s : s + 160] += 2.0
            clip.append(f)
        label = (np.abs(base[..., 0]) * 7).astype(np.int64) % self.num_classes
        return clip, label, {"relpath": f"synthetic/{index}.png"}


def build_argparser():
    parser = argparse.ArgumentParser(description="BlockCopy-TPU Segmentation")
    parser.add_argument("--demo-dir", type=str, default="")
    parser.add_argument("--cityscapes-dir", type=str, default="")
    parser.add_argument("--synthetic", action="store_true",
                        help="run on generated clips (no dataset needed)")
    parser.add_argument("--mode", type=str, default="val",
                        choices=["val", "test"])
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--res", type=int, default=1024,
                        help="smallest image side in pixels")
    parser.add_argument("--clip-length", type=int, default=20)
    parser.add_argument("--workers", type=int, default=6)
    parser.add_argument("--num-clips-warmup", type=int, default=500)
    parser.add_argument("--num-clips-eval", type=int, default=-1)
    parser.add_argument("--model-backbone", default="resnet18", type=str)
    parser.add_argument("--model-checkpoint",
                        default="pretrained/swiftnet_rn18.pth", type=str)
    parser.add_argument("--half", action="store_true",
                        help="bfloat16 model (policy stays float32)")
    parser.add_argument("--output-dir", default="", type=str)
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--single-clip-loop", action="store_true")
    parser.add_argument("--native-io", action="store_true",
                        help="decode clips with the C++ IO library")
    parser.add_argument("--policy-checkpoint", type=str, default="",
                        help="npz path: load the online policy state before "
                        "warmup if present, save it after warmup "
                        "(improvement over the reference, which retrains "
                        "the policy from scratch every run)")
    parser.add_argument("--speed-mode", action="store_true",
                        help="fixed-capacity fused stepper: the whole frame "
                        "step is one compiled program, zero host syncs "
                        "(rl policy only; implies --fast semantics)")
    parser.add_argument("--num-devices", type=int, default=1,
                        help="shard clips data-parallel over an N-device "
                        "mesh (speed mode only): each device steps one clip, "
                        "policy gradients are pmean'd over the mesh "
                        "(live replacement for the reference's dead "
                        "multi_gpu_test, tools/test_city_person.py:128-190)")
    parser.add_argument("--timings", type=int, default=0)
    add_argparser_arguments(parser)
    return parser


def main(argv=None):
    args = build_argparser().parse_args(argv)
    logger.info("Arguments: %s", args)
    # multi-host entry (reference init_dist analog, mmdet/apis/env.py:13-51):
    # env-driven, strict no-op in a single-process launch; must run before
    # the first device use
    from blockcopy_tpu.parallel.distributed import maybe_initialize
    if maybe_initialize():
        import jax as _jax
        logger.info("distributed: process %d/%d, %d global devices",
                    _jax.process_index(), _jax.process_count(),
                    len(_jax.devices()))
    num_classes = args.block_num_classes
    timings.set_level(args.timings)

    val_transform = et.ExtCompose([
        et.ExtResize((args.res, args.res * 2)),
        et.ExtToArray(),
        et.ExtNormalize(mean=CityscapesVid.mean, std=CityscapesVid.std),
    ])

    if args.synthetic:
        has_labels = True
        n_warm = max(args.num_clips_warmup, 0) or 4
        n_eval = args.num_clips_eval if args.num_clips_eval > 0 else 4
        dataset_warmup = SyntheticClipDataset(n_warm, args.clip_length,
                                              args.res, args.res * 2,
                                              num_classes)
        dataset_eval = SyntheticClipDataset(n_eval, args.clip_length,
                                            args.res, args.res * 2,
                                            num_classes, seed=10_000)
    elif args.demo_dir:
        has_labels = False
        dataset_warmup = DemoImageDataset(args.demo_dir, val_transform)
        dataset_eval = DemoImageDataset(args.demo_dir, val_transform)
    elif args.cityscapes_dir:
        has_labels = not args.fast and args.mode != "test"
        native_kw = dict(native=args.native_io,
                         native_size=(args.res, args.res * 2)) \
            if args.native_io else {}
        dataset_warmup = CityscapesVid(args.cityscapes_dir, split="train",
                                       transform=val_transform,
                                       clip_length=args.clip_length,
                                       has_labels=has_labels, **native_kw)
        dataset_eval = CityscapesVid(args.cityscapes_dir, split=args.mode,
                                     transform=val_transform,
                                     clip_length=args.clip_length,
                                     has_labels=has_labels, **native_kw)
    else:
        raise AttributeError("need --synthetic, --demo-dir or --cityscapes-dir")

    # Model
    dtype = jnp.bfloat16 if args.half else jnp.float32
    cfg = SwiftNetConfig(backbone=args.model_backbone,
                         num_classes=num_classes)
    if args.model_checkpoint and os.path.isfile(args.model_checkpoint):
        logger.info("=> loading model checkpoint '%s'", args.model_checkpoint)
        params = load_params(args.model_checkpoint, cfg, dtype=dtype)
    else:
        logger.warning("checkpoint '%s' not found: using random init",
                       args.model_checkpoint)
        params = init_swiftnet(jax.random.PRNGKey(0), cfg, dtype=dtype)

    apply_fn = make_apply_fn(cfg)
    static = args.block_policy == "static"
    model = None
    stepper_state = {}
    if args.speed_mode and not static:
        from blockcopy_tpu.core.stepper import (
            FixedCapacityStepper, StepperConfig,
        )
        gh, gw = args.res // args.block_size, args.res * 2 // args.block_size
        capacity = max(1, int(round(args.block_target * gh * gw)))
        stepper = FixedCapacityStepper(
            apply_fn, StepperConfig.from_settings(vars(args)),
            (args.batch_size, args.res, args.res * 2, 3), capacity,
            dtype=dtype,
        )
        stepper_state["stepper"] = stepper
        if args.num_devices > 1:
            from blockcopy_tpu.parallel import clip_parallel

            assert args.batch_size == 1, \
                "--num-devices shards clips; use it with --batch-size 1"
            mesh = clip_parallel.make_mesh(args.num_devices)
            first, step = clip_parallel.build_parallel_steps(stepper, mesh)
            stepper_state["first"] = first
            stepper_state["step"] = step
            stepper_state["state"] = clip_parallel.init_parallel_state(
                stepper, params, jax.random.PRNGKey(1), args.num_devices)
            stepper_state["devices"] = args.num_devices
            stepper_state["mesh"] = mesh
            logger.info("mesh eval: %d devices x 1 clip", args.num_devices)
        else:
            stepper_state["first"] = jax.jit(stepper.first_step,
                                             donate_argnums=(1,))
            stepper_state["step"] = jax.jit(stepper.step, donate_argnums=(1,))
            stepper_state["state"] = stepper.init_state(params,
                                                        jax.random.PRNGKey(1))
        logger.info("speed mode: capacity %d/%d blocks, %.2f GMACs/frame",
                    capacity, gh * gw,
                    stepper.macs_per_step(params) / 1e9)
    elif not static:
        model = blockcopy_tpu.BlockCopyModel(apply_fn, params, vars(args))
    dense_fwd = jax.jit(lambda p, x: swiftnet_apply(p, x, ExecCtx.dense(), cfg))

    output_dir = None
    if args.output_dir:
        assert not args.fast, "Cannot combine fast option with output_dir"
        output_dir = os.path.join("output_demo", args.output_dir)
        os.makedirs(output_dir, exist_ok=True)

    upsample = jax.jit(
        lambda o, hw: jnp.argmax(
            resize_bilinear(o.astype(jnp.float32), hw), axis=-1
        ),
        static_argnums=(1,),
    )

    staged_clip = {}

    def process_clip(clip, meta, phase):
        """clip: list over time of (B, H, W, 3) numpy frames."""
        if model is not None:
            model.reset_temporal()
        if stepper_state:
            stepper_state["state"] = stepper_state["stepper"].reset_temporal(
                stepper_state["state"])
        preds = None
        for frame_id, frame in enumerate(clip):
            if args.single_clip_loop and frame_id in staged_clip:
                # device-staged frames: measure model FPS, not host conversion
                inputs = staged_clip[frame_id]
                arr = None
            else:
                arr = np.asarray(frame, np.float32)
                # cast on the host so the device upload is half-width
                inputs = jax.device_put(arr.astype(dtype))
                if args.single_clip_loop:
                    staged_clip[frame_id] = inputs
            timings.add_count(inputs.shape[0])
            with timings.env("process_clip/model", 2):
                if stepper_state:
                    fn = stepper_state["first"] if frame_id == 0 else \
                        stepper_state["step"]
                    d = stepper_state.get("devices", 0)
                    # mesh mode: (D, H, W, 3) -> (D, 1, H, W, 3), one clip
                    # per device; outputs fold back to (D, h, w, C)
                    x = inputs.reshape(d, 1, *inputs.shape[1:]) if d \
                        else inputs
                    stepper_state["state"] = fn(params,
                                                stepper_state["state"], x)
                    out = stepper_state["state"]["outputs"]
                    if d:
                        out = out.reshape(d, *out.shape[2:])
                elif model is not None:
                    out = model(inputs)
                else:
                    out = dense_fwd(params, inputs)
                if frame_id == len(clip) - 1 or output_dir:
                    preds = upsample(out, inputs.shape[1:3])
            if output_dir and phase != "warmup":
                if arr is None:
                    arr = np.asarray(inputs, np.float32)
                _dump_viz(args, output_dir, phase, meta, frame_id, arr,
                          preds, model)
        return preds

    def process_dataset(dataset, phase, max_num_clips):
        metrics = StreamSegMetrics(
            num_classes, classes=CityscapesVid.fine_classes,
            class_names=CityscapesVid.train_id_to_name,
        )
        timings.reset()
        loader = PrefetchLoader(dataset, num_workers=args.workers,
                                max_items=max_num_clips
                                if max_num_clips >= 0 else -1)
        logger.info("## phase %s: %d clips", phase, len(loader))
        start = time.perf_counter()
        num_images = 0
        cached = None
        preds = None

        def batched(it, bsize):
            """Group consecutive clips into time-major batches
            (the torch DataLoader's collate, reference
            ``test_swiftnet.py:70-80``)."""
            group = []
            for item in it:
                group.append(item)
                if len(group) == bsize:
                    yield _collate(group)
                    group = []
            if group and bsize == 1:
                yield _collate(group)
            elif group:
                # partial batches are dropped for bsize>1: temporal state
                # and compiled programs are shape-static per batch size
                # (reference batch>1 speed configs do the same via the
                # torch DataLoader's drop_last)
                logger.warning(
                    "dropping %d tail clip(s) not filling a group of %d; "
                    "use a clip count divisible by the group size to "
                    "evaluate them", len(group), bsize)

        def _collate(group):
            clips = [g[0] for g in group]
            t_len = len(clips[0])
            clip_b = [np.stack([np.asarray(c[t], np.float32) for c in clips])
                      for t in range(t_len)]
            targets = [g[1] for g in group]
            target_b = (np.stack(targets)
                        if not any(isinstance(t, int) for t in targets)
                        else 0)
            return clip_b, target_b, group[0][2]

        # mesh mode groups one clip per device; batch mode groups per batch
        group_size = args.batch_size if args.num_devices <= 1 \
            else args.num_devices
        for i, (clip, target, meta) in enumerate(
            batched(iter(loader), group_size)
        ):
            if args.single_clip_loop:
                if cached is None:
                    cached = (clip, target, meta)
                clip, target, meta = cached
            num_images += len(clip) * clip[0].shape[0]
            with timings.env("process_dataset/process_clip", 1):
                preds = process_clip(clip, meta, phase)
            if has_labels and not args.fast and not isinstance(target, int):
                metrics.update(np.asarray(target), np.asarray(preds))
        # fence with a real device->host read (block_until_ready can return
        # early on relay backends)
        if preds is not None:
            float(jnp.sum(preds))
        stop = time.perf_counter()

        logger.info("Number of images: %d", num_images)
        if phase == "eval":
            fps = num_images / (stop - start)
            results = {"fps": fps}
            if has_labels and not args.fast:
                metric_results = metrics.get_results()
                logger.info("Mean IoU %.2f", metric_results["Mean IoU"] * 100)
                results.update(
                    {k: v for k, v in metric_results.items()
                     if k != "Class IoU"}
                )
            logger.info("Average FPS: %.2f", fps)
            from blockcopy_tpu.utils.flops import format_gmacs_breakdown
            if model is not None:
                breakdown = model.flops.average_macs_by_module()
                logger.info("%s", format_gmacs_breakdown(breakdown))
                results["gmacs_per_image"] = model.flops.average_gmacs()
                results["gmacs_breakdown"] = {
                    k: v / 1e9 for k, v in breakdown.items()}
                logger.info("%s", model.policy.stats)
                results["perc_exec"] = model.policy.stats.get_exec_percentage()
            elif stepper_state:
                st = stepper_state["stepper"]
                breakdown = st.macs_breakdown_per_step(params)
                logger.info("%s", format_gmacs_breakdown(breakdown))
                results["gmacs_per_image"] = sum(breakdown.values()) / 1e9
                results["gmacs_breakdown"] = {
                    k: v / 1e9 for k, v in breakdown.items()}
                results["perc_exec"] = st.capacity / st.total
                results["running_cost"] = float(jnp.mean(
                    stepper_state["state"]["policy"]["running_cost"]))
            else:
                # static baseline cost (reference prints GMACs for the
                # static run too, test_swiftnet.py:240-244): exact dense
                # MACs from a trace of the same model code
                dense_ctx = ExecCtx.dense()
                jax.eval_shape(
                    lambda x: swiftnet_apply(params, x, dense_ctx, cfg),
                    jax.ShapeDtypeStruct(
                        (1, args.res, args.res * 2, 3), dtype))
                breakdown = dense_ctx.macs_by_module()
                logger.info("%s", format_gmacs_breakdown(breakdown))
                results["gmacs_per_image"] = sum(breakdown.values()) / 1e9
                results["gmacs_breakdown"] = {
                    k: v / 1e9 for k, v in breakdown.items()}
            if args.timings:
                logger.info("%s", timings)
            return results
        return None

    def check_policy_health(phase):
        """Phase-boundary NaN guard for the fused stepper (the ladder
        engine has per-update guards under --block-policy-verbose
        instead)."""
        if not stepper_state:
            return
        from blockcopy_tpu.core.stepper import FixedCapacityStepper
        FixedCapacityStepper.check_policy_finite(
            stepper_state["state"]["policy"], phase)

    def load_stepper_policy(path):
        # shared with the detection CLI — utils/policy_ckpt.py
        from blockcopy_tpu.utils.policy_ckpt import (
            load_stepper_policy as _load)
        stepper_state["state"] = {
            **stepper_state["state"],
            "policy": _load(path, stepper_state["state"]["policy"],
                            devices=stepper_state.get("devices", 0),
                            mesh=stepper_state.get("mesh"))}

    def save_stepper_policy(path):
        from blockcopy_tpu.utils.policy_ckpt import (
            save_stepper_policy as _save)
        _save(path, stepper_state["state"]["policy"],
              devices=stepper_state.get("devices", 0))

    # os.path.exists, not isfile: orbax checkpoints are directories
    if args.policy_checkpoint and os.path.exists(args.policy_checkpoint):
        if model is not None:
            logger.info("loading policy state from %s", args.policy_checkpoint)
            model.load_policy(args.policy_checkpoint)
        elif stepper_state:
            logger.info("loading policy state from %s", args.policy_checkpoint)
            load_stepper_policy(args.policy_checkpoint)
    process_dataset(dataset_warmup, "warmup", args.num_clips_warmup)
    check_policy_health("warmup")
    if args.policy_checkpoint:
        if model is not None:
            model.save_policy(args.policy_checkpoint)
            logger.info("saved policy state to %s", args.policy_checkpoint)
        elif stepper_state:
            save_stepper_policy(args.policy_checkpoint)
            logger.info("saved policy state to %s", args.policy_checkpoint)
    if model is not None:
        model.flops.reset_frames()
        model.policy.stats = type(model.policy.stats)()
    results = process_dataset(dataset_eval, "eval", args.num_clips_eval)
    check_policy_health("eval")
    print(json.dumps({k: (float(v) if isinstance(v, (int, float, np.floating))
                          else v) for k, v in results.items()}))
    return results


def _dump_viz(args, output_dir, phase, meta, frame_id, arr, preds, model):
    """Input / prediction / exec-grid overlays (reference
    ``test_swiftnet.py:200-230``), written with PIL."""
    from PIL import Image
    from blockcopy_tpu.data.transforms import denormalize

    phase_dir = osp.join(output_dir, phase)
    os.makedirs(phase_dir, exist_ok=True)
    relpath = meta["relpath"]
    fname = ".".join(relpath.replace("/", "-").split(".")[:-1]) + f"_{frame_id}"

    img = denormalize(arr[0], CityscapesVid.mean, CityscapesVid.std)
    img = np.clip(img, 0, 1)
    Image.fromarray((img * 255).astype(np.uint8)).resize((1024, 512)).save(
        osp.join(phase_dir, f"{fname}_input.jpg")
    )
    pred_color = CityscapesVid.decode_target(np.asarray(preds)[0]).astype(
        np.uint8
    )
    Image.fromarray(pred_color).resize((1024, 512), Image.NEAREST).save(
        osp.join(phase_dir, f"{fname}_output.jpg")
    )
    if model is not None and "grid" in model.policy_meta:
        grid = np.asarray(model.policy_meta["grid"])[0].astype(np.float32)
        overlay = img.copy()
        gh, gw = grid.shape
        bh, bw = img.shape[0] // gh, img.shape[1] // gw
        for gy in range(gh):
            for gx in range(gw):
                c = np.array([0.2, 0.8, 0.2]) if grid[gy, gx] else \
                    np.array([0.5, 0.2, 0.7])
                sl = np.s_[gy * bh:(gy + 1) * bh, gx * bw:(gx + 1) * bw]
                overlay[sl] = 0.6 * overlay[sl] + 0.4 * c
        Image.fromarray((np.clip(overlay, 0, 1) * 255).astype(np.uint8)) \
            .resize((1024, 512)).save(osp.join(phase_dir, f"{fname}_grid.jpg"))


if __name__ == "__main__":
    main()
