"""CSP + BlockCopy detection evaluation CLI.

Mirrors the reference driver ``Pedestron/tools/test_city_person.py``: builds
warmup (train-split) and eval dataloaders of CityPersons clips, runs the
per-clip BlockCopy loop (``reset_temporal`` per clip, per-frame
``simple_test``), dumps COCO-format detections, and reports the four
CityPersons miss rates plus average sparse GMACs.

Configs are mmdet-style python files loaded through
``blockcopy_tpu.utils.registry`` (see ``configs/csp/``); ``--synthetic``
runs on generated clips for data-free smoke tests.
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

from blockcopy_tpu.core.argparser import add_argparser_arguments
from blockcopy_tpu.data.loader import PrefetchLoader
from blockcopy_tpu.models.csp import CSPBlockCopy, CSPConfig, init_csp
from blockcopy_tpu.tasks.detection.dataset import CityPersonsClipDataset
from blockcopy_tpu.tasks.detection.eval_mr import (
    CityPersonsMREvaluator,
    SETUP_LABELS,
    bbox_results_to_coco,
)
from blockcopy_tpu.utils.profiler import timings

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("blockcopy_tpu.detection")


class SyntheticDetClipDataset:
    """Generated pedestrian-ish clips with moving bright blobs + matching
    COCO GT, for data-free runs."""

    def __init__(self, num_clips, clip_length, height, width, seed=0):
        self.num_clips = num_clips
        self.clip_length = clip_length
        self.h, self.w = height, width
        self.seed = seed

    def __len__(self):
        return self.num_clips

    def coco_gt(self):
        images, anns = [], []
        aid = 1
        for i in range(self.num_clips):
            images.append({"id": i + 1,
                           "file_name": f"synthetic_{i:06d}_leftImg8bit.png",
                           "width": self.w, "height": self.h})
            for x, y, w, h in self._boxes(i, self.clip_length - 1):
                anns.append({
                    "id": aid, "image_id": i + 1, "category_id": 1,
                    "bbox": [x, y, w, h], "height": h, "vis_ratio": 1.0,
                    "ignore": 0, "iscrowd": 0, "area": w * h,
                })
                aid += 1
        return {"images": images, "annotations": anns,
                "categories": [{"id": 1, "name": "pedestrian"}]}

    def _boxes(self, index, t):
        rs = np.random.RandomState(self.seed + index)
        n = rs.randint(1, 4)
        boxes = []
        for k in range(n):
            x = int(rs.randint(0, self.w - 80)) + 3 * t
            y = int(rs.randint(0, self.h - 160))
            boxes.append((min(x, self.w - 40), y, 33, 80))
        return boxes

    def __getitem__(self, index):
        rs = np.random.RandomState(self.seed + index)
        base = rs.randn(self.h, self.w, 3).astype(np.float32) * 0.3
        clip = []
        for t in range(self.clip_length):
            f = base.copy()
            for x, y, w, h in self._boxes(index, t):
                f[y:y + h, x:x + w] += 2.5
            clip.append(f)
        meta = {"image_id": index + 1,
                "file_name": f"synthetic_{index:06d}_leftImg8bit.png",
                "img_shape": (self.h, self.w), "scale_factor": 1.0,
                "is_clip": True}
        return clip, [], meta


def build_argparser():
    p = argparse.ArgumentParser(description="BlockCopy-TPU CSP test")
    p.add_argument("--config", type=str, default="",
                   help="mmdet-style python config file")
    p.add_argument("--checkpoint", type=str, default="")
    p.add_argument("--ann-file", type=str, default="")
    p.add_argument("--img-prefix", type=str, default="")
    p.add_argument("--ann-file-warmup", type=str, default="")
    p.add_argument("--img-prefix-warmup", type=str, default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--clip-length", type=int, default=20)
    p.add_argument("--num-clips-warmup", type=int, default=300)
    p.add_argument("--num-clips-eval", type=int, default=-1)
    p.add_argument("--workers", type=int, default=6)
    p.add_argument("--half", action="store_true")
    p.add_argument("--out", type=str, default="",
                   help="json file for detection dump")
    p.add_argument("--output-dir", type=str, default="",
                   help="write detection/grid visualization overlays")
    p.add_argument("--timings", type=int, default=0)
    p.add_argument("--policy-checkpoint", type=str, default="",
                   help="load the online policy state from this path if it "
                   "exists, and (re)save it after warmup — amortizes the "
                   "300-400 clip warmup the reference pays every run "
                   "(test_city_person.py:218).  npz = single-replica flat "
                   "file; a non-.npz path in mesh mode = orbax directory "
                   "(same contract as the semseg CLI)")
    p.add_argument("--checkpoint-start", type=int, default=-1,
                   help="with --checkpoint-end: evaluate the epoch range "
                   "[start, end) of a training run, treating --checkpoint "
                   "as the run directory of epoch_N[_teacher].npz files "
                   "and POLLING until each appears — the reference's "
                   "eval-alongside-training loop "
                   "(Pedestron tools/test_city_person.py:250-290)")
    p.add_argument("--checkpoint-end", type=int, default=-1)
    p.add_argument("--mean-teacher", action="store_true",
                   help="epoch-range mode evaluates the EMA-teacher "
                   "checkpoints (reference .pth.stu role)")
    p.add_argument("--poll-seconds", type=float, default=5.0,
                   help="epoch-range mode: wait granularity (reference "
                   "time.sleep(5), test_city_person.py:278-284)")
    p.add_argument("--speed-mode", action="store_true",
                   help="fused fixed-capacity detection stepper: policy + "
                   "blocked CSP + on-device decode/NMS/IoU-gain as one "
                   "compiled program, zero steady-state host syncs")
    p.add_argument("--num-devices", type=int, default=1,
                   help="shard clips data-parallel over an N-device mesh "
                   "(speed mode only): each device steps one clip, policy "
                   "gradients are pmean'd over the mesh (live replacement "
                   "for the reference's dead multi_gpu_test, "
                   "tools/test_city_person.py:128-190)")
    add_argparser_arguments(p)
    p.set_defaults(block_policy="rl_objectdetection", block_num_classes=1,
                   block_target=0.3, block_optim_wd=0.0001)
    return p


class _StepperDetector:
    """DetectionStepper behind the ladder engine's interface
    (``reset_temporal`` / ``simple_test``) so the eval loop is shared."""

    def __init__(self, params, csp_cfg, settings, frame_shape, dtype,
                 n_devices=1):
        import jax as _jax

        from blockcopy_tpu.core.stepper import StepperConfig
        from blockcopy_tpu.tasks.detection.stepper import DetectionStepper

        scfg = StepperConfig.from_settings(settings)
        gh = frame_shape[1] // scfg.block_size
        gw = frame_shape[2] // scfg.block_size
        capacity = max(1, int(round(settings["block_target"] * gh * gw)))
        self.params = params
        self.csp_cfg = csp_cfg
        self.n_devices = n_devices
        self.stepper = DetectionStepper(csp_cfg, scfg, frame_shape, capacity,
                                        dtype=dtype)
        self.mesh = None
        if n_devices > 1:
            from blockcopy_tpu.parallel import clip_parallel

            self.mesh = clip_parallel.make_mesh(n_devices)
            self._first, self._step = clip_parallel.build_parallel_steps(
                self.stepper, self.mesh)
            self.state = clip_parallel.init_parallel_state(
                self.stepper, params, _jax.random.PRNGKey(1), n_devices)
        else:
            self.state = self.stepper.init_state(params,
                                                 _jax.random.PRNGKey(1))
            self._first = _jax.jit(self.stepper.first_step,
                                   donate_argnums=(1,))
            self._step = _jax.jit(self.stepper.step, donate_argnums=(1,))
        self._frame_id = 0

    def reset_temporal(self):
        self.state = self.stepper.reset_temporal(self.state)
        self._frame_id = 0

    def simple_test(self, img, img_shape=None):
        self.step_only(img)
        return self.current_results()

    def step_only(self, img):
        """Step without fetching detections (keeps the program async: the
        dets stay on-device until ``simple_test``'s conversion or
        ``group_results`` pulls them — only the clip's final annotated frame
        is evaluated, as in the reference ``test_city_person.py``).

        In mesh mode ``img`` is ``(D, 1, H, W, 3)``, one clip per device."""
        fn = self._first if self._frame_id == 0 else self._step
        self.state = fn(self.params, self.state, img)
        self._frame_id += 1

    def _fetch_results(self, dets, labels, valid):
        """Host-side finish of one frame's fixed-size decode output.

        ``nms_type='soft_nms'`` reruns the host soft-NMS rescoring here —
        same semantics as the ladder engine (``models/csp.py`` simple_test);
        the cost lands only on fetched frames (one annotated frame per
        clip), so speed mode keeps its zero steady-state host syncs.
        Reference capability: ``soft_nms_cpu.pyx`` via
        ``mmdet/ops/nms/nms_wrapper.py``."""
        from blockcopy_tpu.models.csp import (dets_to_bbox_results,
                                              soft_nms_rescore)

        if self.csp_cfg.nms_type == "soft_nms":
            dets, labels, valid = soft_nms_rescore(dets, labels, valid,
                                                   self.csp_cfg)
        return dets_to_bbox_results(dets, labels, valid,
                                    self.csp_cfg.num_classes)[0]

    def current_results(self):
        """bbox results of the latest stepped frame (single-device)."""
        return self._fetch_results(self.state["dets"], self.state["labels"],
                                   self.state["valid"])

    def group_results(self):
        """Per-device bbox results from the current on-device dets."""
        dets = np.asarray(self.state["dets"])
        labels = np.asarray(self.state["labels"])
        valid = np.asarray(self.state["valid"])
        return [self._fetch_results(dets[d], labels[d], valid[d])
                for d in range(dets.shape[0])]

    @property
    def policy_meta(self):
        # viz compatibility with the ladder engine's meta dict
        return {"grid": self.state["prev_grid"] > 0}

    # policy persistence, symmetric with the semseg CLI (npz single-replica,
    # orbax mesh mode) — shared logic in utils/policy_ckpt.py
    def load_policy(self, path):
        from blockcopy_tpu.utils.policy_ckpt import load_stepper_policy

        devices = self.n_devices if self.n_devices > 1 else 0
        self.state = {**self.state,
                      "policy": load_stepper_policy(
                          path, self.state["policy"], devices=devices,
                          mesh=self.mesh)}

    def save_policy(self, path):
        from blockcopy_tpu.utils.policy_ckpt import save_stepper_policy

        devices = self.n_devices if self.n_devices > 1 else 0
        save_stepper_policy(path, self.state["policy"], devices=devices)


def _explicitly_passed(argv) -> set:
    """Keys the user actually typed on the command line: re-parse the same
    argv with every default set to ``argparse.SUPPRESS`` — only provided
    flags land in the namespace."""
    import argparse

    p = build_argparser()
    for a in p._actions:
        a.default = argparse.SUPPRESS
    p._defaults.clear()
    return set(vars(p.parse_args(argv)).keys())


def _wait_for_epoch(run_dir, epoch, end, suffix, poll_s):
    """Block until ``epoch_<i><suffix>.npz`` exists — and, unless this is
    the final epoch of the range, until the NEXT epoch's file exists too
    (the writer has moved on, so the file is complete).  Reference:
    ``Pedestron/tools/test_city_person.py:276-284``."""
    path = os.path.join(run_dir, f"epoch_{epoch}{suffix}.npz")
    while not os.path.exists(path):
        logger.info("path not existing %s", path)
        time.sleep(poll_s)
    nxt = os.path.join(run_dir, f"epoch_{epoch + 1}{suffix}.npz")
    while epoch + 1 != end and not os.path.exists(nxt):
        logger.info("path not existing %s", nxt)
        time.sleep(poll_s)
    return path


def _run_epoch_range(args, argv):
    """Evaluate every epoch checkpoint of a (possibly still running)
    training run, polling for each file like the reference driver."""
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    # strip the range/teacher/poll flags and any --checkpoint value from
    # the per-epoch argv (all use "--flag value" or store_true forms)
    drop_with_value = {"--checkpoint", "--checkpoint-start",
                       "--checkpoint-end", "--poll-seconds", "--out"}
    cleaned, skip = [], False
    for tok in argv:
        if skip:
            skip = False
            continue
        if tok in drop_with_value:
            skip = True
            continue
        if tok.split("=", 1)[0] in drop_with_value:
            continue
        if tok == "--mean-teacher":
            continue
        cleaned.append(tok)
    suffix = "_teacher" if args.mean_teacher else ""
    summaries = []
    for epoch in range(args.checkpoint_start, args.checkpoint_end):
        path = _wait_for_epoch(args.checkpoint, epoch, args.checkpoint_end,
                               suffix, args.poll_seconds)
        ep_argv = cleaned + ["--checkpoint", path]
        if args.out:
            root, ext = os.path.splitext(args.out)
            ep_argv += ["--out", f"{root}_epoch{epoch}{ext or '.json'}"]
        logger.info("## epoch %d: evaluating %s", epoch, path)
        summaries.append({"epoch": epoch,
                          "result": main(ep_argv)})
    return summaries


def main(argv=None):
    args = build_argparser().parse_args(argv)
    logger.info("Arguments: %s", args)
    if args.checkpoint_start >= 0 or args.checkpoint_end >= 0:
        assert 0 <= args.checkpoint_start < args.checkpoint_end, \
            "--checkpoint-start/--checkpoint-end must form a valid range"
        assert args.checkpoint and not os.path.isfile(args.checkpoint), \
            "epoch-range mode: --checkpoint is the training run DIRECTORY"
        return _run_epoch_range(args, argv)
    # multi-host entry (reference init_dist analog, mmdet/apis/env.py:13-51):
    # env-driven, strict no-op in a single-process launch
    from blockcopy_tpu.parallel.distributed import maybe_initialize
    if maybe_initialize():
        import jax as _jax
        logger.info("distributed: process %d/%d, %d global devices",
                    _jax.process_index(), _jax.process_count(),
                    len(_jax.devices()))
    timings.set_level(args.timings)
    dtype = jnp.bfloat16 if args.half else jnp.float32

    settings = {k: v for k, v in vars(args).items()}
    ckpt = args.checkpoint if args.checkpoint and \
        os.path.isfile(args.checkpoint) else None
    if args.checkpoint and not ckpt:
        logger.warning("checkpoint '%s' not found: random init",
                       args.checkpoint)
    if args.config:
        from blockcopy_tpu.models.builder import build_detector
        from blockcopy_tpu.utils.registry import load_config
        file_cfg = load_config(args.config)
        # precedence: explicit CLI --block-* flags > config
        # blockcopy_settings > CLI defaults.  "Explicit" is detected by a
        # SUPPRESS-default re-parse (not by comparing to parser defaults:
        # a flag passed AT its default value must still override the
        # config, e.g. --block-target 0.3 vs a config's 0.5).
        explicit = _explicitly_passed(argv)
        overrides = {k: settings[k] for k in explicit
                     if k.startswith("block_")}
        model = build_detector(file_cfg, checkpoint=ckpt, dtype=dtype,
                               settings_override=overrides)
        settings = model.settings
    else:
        cfg = CSPConfig()
        if ckpt:
            from blockcopy_tpu.utils.checkpoint import load_npz
            like = init_csp(jax.random.PRNGKey(0), cfg)
            params = load_npz(ckpt, like, dtype)
            logger.info("loaded checkpoint %s", ckpt)
        else:
            params = init_csp(jax.random.PRNGKey(0), cfg, dtype=dtype)
        model = CSPBlockCopy(params, cfg, settings)

    if args.num_devices > 1:
        assert args.speed_mode, "--num-devices requires --speed-mode"
        assert not args.output_dir, \
            "--num-devices does not support viz overlays"
    if args.speed_mode:
        assert args.block_policy == "rl_objectdetection", \
            "--speed-mode uses the fused RL stepper"
        frame_shape = (1, args.res, args.res * 2, 3)
        model = _StepperDetector(model.params, model.cfg, settings,
                                 frame_shape, dtype,
                                 n_devices=args.num_devices)
        if args.num_devices > 1:
            logger.info("mesh eval: %d devices x 1 clip", args.num_devices)

    if args.synthetic:
        n_warm = max(args.num_clips_warmup, 0) or 2
        n_eval = args.num_clips_eval if args.num_clips_eval > 0 else 2
        ds_warm = SyntheticDetClipDataset(n_warm, args.clip_length, args.res,
                                          args.res * 2)
        ds_eval = SyntheticDetClipDataset(n_eval, args.clip_length, args.res,
                                          args.res * 2, seed=10_000)
        evaluator = CityPersonsMREvaluator(ds_eval.coco_gt())
    else:
        assert args.ann_file and args.img_prefix, \
            "need --ann-file/--img-prefix or --synthetic"
        scale = (args.res * 2, args.res)  # dataset takes (w, h)
        ds_eval = CityPersonsClipDataset(args.ann_file, args.img_prefix,
                                         img_scale=scale,
                                         clip_length=args.clip_length)
        warm_ann = args.ann_file_warmup or args.ann_file
        warm_img = args.img_prefix_warmup or args.img_prefix
        ds_warm = CityPersonsClipDataset(warm_ann, warm_img, img_scale=scale,
                                         clip_length=args.clip_length)
        evaluator = CityPersonsMREvaluator(args.ann_file)

    def run_phase_mesh(ds, phase, max_clips):
        """Mesh mode: groups of D clips step frame-synchronous, one clip per
        device; a partial final group is padded by repeating the last clip
        (padded results are discarded, so MR is exact for any clip count)."""
        D = args.num_devices
        loader = PrefetchLoader(ds, num_workers=args.workers,
                                max_items=max_clips if max_clips >= 0 else -1)
        logger.info("## phase %s: %d clips over %d devices", phase,
                    len(loader), D)
        detections = []
        num_images = 0
        start = time.perf_counter()

        def flush(group):
            nonlocal num_images
            real = len(group)
            lengths = {len(g[0]) for g in group}
            assert len(lengths) == 1, \
                f"mesh groups step frame-synchronous and need equal clip " \
                f"lengths, got {sorted(lengths)}"
            group = group + [group[-1]] * (D - real)
            model.reset_temporal()
            for t in range(len(group[0][0])):
                frames = np.stack(
                    [np.asarray(g[0][t], np.float32) for g in group])
                num_images += real
                model.step_only(jnp.asarray(frames[:, None], dtype))
            if phase == "eval":
                results = model.group_results()
                for d in range(real):
                    # results[d] is the per-class array list for device d
                    detections.extend(bbox_results_to_coco(
                        results[d], group[d][2]["image_id"]))

        group = []
        for item in iter(loader):
            group.append(item)
            if len(group) == D:
                flush(group)
                group = []
        if group:
            flush(group)
        if phase != "eval":
            # fence the timing with a device->host read
            model.group_results()
        elapsed = time.perf_counter() - start
        return detections, num_images, elapsed

    def run_phase(ds, phase, max_clips):
        if getattr(model, "n_devices", 1) > 1:
            return run_phase_mesh(ds, phase, max_clips)
        loader = PrefetchLoader(ds, num_workers=args.workers,
                                max_items=max_clips if max_clips >= 0 else -1)
        logger.info("## phase %s: %d clips", phase, len(loader))
        detections = []
        num_images = 0
        start = time.perf_counter()
        for clip, _, meta in iter(loader):
            model.reset_temporal()
            viz = args.output_dir and phase == "eval"
            # stepper without viz: don't pull dets to the host every frame —
            # only the clip's final annotated frame is evaluated, so the
            # steady state keeps the stepper's zero-host-sync property
            lazy = isinstance(model, _StepperDetector) and not viz
            for frame_id, frame in enumerate(clip):
                arr = jnp.asarray(np.asarray(frame, np.float32)[None], dtype)
                num_images += 1
                if lazy:
                    model.step_only(arr)
                else:
                    bbox_results = model.simple_test(
                        arr, img_shape=meta["img_shape"])
                if viz:
                    _dump_viz(args, phase, meta, frame_id,
                              np.asarray(frame, np.float32), bbox_results,
                              model)
            if lazy:
                bbox_results = model.current_results()
            if phase == "eval":
                # bbox_results is the full per-class list — pass it whole
                # (indexing [0] would silently drop classes beyond class 0
                # in multi-class configs)
                detections.extend(
                    bbox_results_to_coco(
                        bbox_results if isinstance(bbox_results, list)
                        else [bbox_results],
                        meta["image_id"])
                )
        elapsed = time.perf_counter() - start
        return detections, num_images, elapsed

    def check_policy_health(phase):
        if not args.speed_mode:
            return
        from blockcopy_tpu.core.stepper import FixedCapacityStepper
        FixedCapacityStepper.check_policy_finite(model.state["policy"], phase)

    # os.path.exists, not isfile: orbax checkpoints are directories
    if args.policy_checkpoint and os.path.exists(args.policy_checkpoint):
        logger.info("loading policy state from %s", args.policy_checkpoint)
        model.load_policy(args.policy_checkpoint)
    run_phase(ds_warm, "warmup", args.num_clips_warmup)
    check_policy_health("warmup")
    if args.policy_checkpoint:
        model.save_policy(args.policy_checkpoint)
        logger.info("saved policy state to %s", args.policy_checkpoint)
    if not args.speed_mode:
        model.flops.reset_frames()
    dets, num_images, elapsed = run_phase(ds_eval, "eval",
                                          args.num_clips_eval)
    check_policy_health("eval")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(dets, f)
        logger.info("wrote %d detections to %s", len(dets), args.out)

    mrs = evaluator.evaluate(dets)
    results = {f"MR_{k}": v for k, v in mrs.items()}
    results["fps"] = num_images / elapsed
    from blockcopy_tpu.utils.flops import format_gmacs_breakdown
    if args.speed_mode:
        breakdown = model.stepper.macs_breakdown_per_step(model.params)
        results["gmacs_per_image"] = sum(breakdown.values()) / 1e9
        results["perc_exec"] = model.stepper.capacity / model.stepper.total
    else:
        breakdown = model.flops.average_macs_by_module()
        results["gmacs_per_image"] = model.flops.average_gmacs()
        results["perc_exec"] = model.policy.stats.get_exec_percentage()
    results["gmacs_breakdown"] = {k: v / 1e9 for k, v in breakdown.items()}
    # effective (post config/CLI merge) target, for observability + tests
    results["block_target"] = float(settings["block_target"])
    for k in SETUP_LABELS:
        logger.info("Average Miss Rate (MR) %-22s = %.2f%%", k,
                    mrs[k])
    # per-module cost tree, the reference's reported breakdown shape
    # (Pedestron/README.md:51-62: backbone + neck + bbox_head + policy)
    logger.info("%s", format_gmacs_breakdown(breakdown))
    if args.timings:
        logger.info("%s", timings)
    print(json.dumps(results))
    return results


def _dump_viz(args, phase, meta, frame_id, frame, bbox_results, model):
    """Detections + exec-grid overlays (reference
    ``test_city_person.py:64-117``), written with PIL."""
    from PIL import Image, ImageDraw
    from blockcopy_tpu.tasks.detection.dataset import IMG_MEAN, IMG_STD

    out_dir = os.path.join(args.output_dir, phase)
    os.makedirs(out_dir, exist_ok=True)
    img = np.clip(frame * IMG_STD + IMG_MEAN, 0, 255).astype(np.uint8)
    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    for arr in bbox_results:
        for x1, y1, x2, y2, score in np.asarray(arr):
            if score < 0.3:
                continue
            draw.rectangle([x1, y1, x2, y2], outline=(255, 40, 40), width=3)
            draw.text((x1 + 2, y1 + 2), f"{score:.2f}", fill=(255, 240, 0))
    if "grid" in model.policy_meta:
        grid = np.asarray(model.policy_meta["grid"])[0]
        gh, gw = grid.shape
        bh, bw = img.shape[0] // gh, img.shape[1] // gw
        overlay = np.asarray(pil).astype(np.float32)
        tint = np.where(
            np.kron(grid, np.ones((bh, bw)))[..., None] > 0,
            np.array([40.0, 160.0, 40.0]), np.array([100.0, 40.0, 140.0]),
        )
        overlay = 0.75 * overlay + 0.25 * tint
        pil = Image.fromarray(np.clip(overlay, 0, 255).astype(np.uint8))
    name = meta["file_name"].replace("/", "-").rsplit(".", 1)[0]
    pil.resize((1024, 512)).save(
        os.path.join(out_dir, f"{name}_{frame_id}_dets.jpg"))


if __name__ == "__main__":
    main()
