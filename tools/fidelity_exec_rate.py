"""Exec-rate-tracking fidelity vs the reference policy (VERDICT r4 item 4).

Free-runs the reference's *actual* torch ``PolicyTrainRL``
(``blockcopy/blockcopy/policy/policy.py:219-370``) and this framework's JAX
``PolicyTrainRL`` closed-loop on identical synthetic streams at several
targets, and compares the equilibrium execution rates.  The question it
answers: all VALIDATION artifacts land above their target (e.g. 0.606-0.613
at t=0.5) — is that overshoot mechanism-faithful (the reference's
running-cost EMA + signed-square complexity reward equilibrates the same
way on this stream), or a defect of this implementation?

Closed loop without a task model: a simulator refreshes the output logits
only inside executed blocks (skipped blocks keep stale outputs), exactly the
property that makes information gain depend on the policy's own decisions
in the real pipeline (``core/blockcopy.py:62-83``).  Both implementations
see the same frames, the same dense-output stream, the same clip structure
(reset + forced all-exec first frame), the same train schedule
(``clip_length % train_interval == 0``, ``core/blockcopy.py:87``), and the
same count quantization (the reference's fixed 1/16, ``policy.py:22``).
Only the Bernoulli RNG streams differ.

Runs on CPU (mechanism fidelity, not speed):
    python tools/fidelity_exec_rate.py --out VALIDATION_fidelity.json
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

H, W = 512, 1024
BS = 128
GH, GW = H // BS, W // BS
C = 19
CLIP_LEN = 10
TRAIN_INTERVAL = 4


# ---------------------------------------------------------------------------
# shared synthetic stream (numpy, NCHW)
# ---------------------------------------------------------------------------

def make_clip(index, seed=0, amp=2.5, boost=4.0):
    """Static background + two moving objects; returns per-frame
    (frame (1,3,H,W), dense_logits (1,C,H,W)).  Same track construction as
    ``tools/validate_capability.py:make_clip``."""
    rs = np.random.RandomState(seed + index)
    base = rs.randn(1, 3, H, W).astype(np.float32)
    bg_logits = rs.randn(1, C, 1, 1).astype(np.float32) * np.ones(
        (1, C, H, W), np.float32)
    frames = []
    for t in range(CLIP_LEN):
        f = base.copy()
        o = bg_logits.copy()
        for k in range(2):
            x = (37 * (index + k) + 23 * t * (k + 1)) % (W - 160)
            y = (53 * (index + 2 * k) + 15 * t) % (H - 160)
            f[:, :, y:y + 140, x:x + 140] += amp
            o[:, (t + k) % C, y:y + 140, x:x + 140] += boost
        frames.append((f, o))
    return frames


def block_composite(canvas, fresh, grid):
    """Per-block select: executed blocks take ``fresh``, others keep
    ``canvas``.  grid: (GH, GW) bool; arrays NCHW."""
    mask = np.kron(grid.astype(np.float32),
                   np.ones((BS, BS), np.float32))[None, None]
    return canvas * (1.0 - mask) + fresh * mask


# ---------------------------------------------------------------------------
# runners: one closed-loop stepper per implementation
# ---------------------------------------------------------------------------

class TorchRunner:
    """Drives the reference's unmodified torch PolicyTrainRL."""

    name = "reference_torch"

    def __init__(self, settings, seed=0):
        import torch
        from test_reference_model_parity import _install_blockcopy_stub
        _install_blockcopy_stub()
        ref_bc = "/root/reference/blockcopy"
        if ref_bc not in sys.path:
            sys.path.insert(0, ref_bc)
        import blockcopy.policy.policy as ref_policy_mod
        self.torch = torch
        torch.manual_seed(seed)
        self.pol = ref_policy_mod.build_policy_from_settings(settings)
        self.pol.net.train()
        self.meta = {"inputs": None, "outputs": None, "outputs_prev": None}
        self.clip_length = 0

    def reset(self):
        self.meta = {"inputs": None, "outputs": None, "outputs_prev": None}
        self.clip_length = 0

    def step(self, frame, dense_out):
        torch = self.torch
        self.clip_length += 1
        self.meta["inputs"] = torch.from_numpy(frame)
        with torch.no_grad():
            self.meta = self.pol(self.meta)
        grid = self.meta["grid"].numpy()[0, 0].astype(bool)
        # simulated task model: refresh executed blocks only
        prev = self.meta["outputs"]
        if prev is None:
            out = dense_out.copy()
            fs = frame.copy()
        else:
            out = block_composite(prev.numpy(), dense_out, grid)
            fs = block_composite(self.meta["frame_state"].numpy(), frame,
                                 grid)
        self.meta["frame_state"] = torch.from_numpy(fs.astype(np.float32))
        self.meta["outputs_prev"] = self.meta["outputs"]
        self.meta["outputs"] = torch.from_numpy(out.astype(np.float32))
        train = self.clip_length % TRAIN_INTERVAL == 0
        self.meta = self.pol.optim(self.meta, train=train)
        sep = None
        if "grid_probs" in self.meta:
            g = self.meta["grid"]
            p = self.meta["grid_probs"]
            sep = float(p[g].mean() - p[~g].mean())
        return float(self.meta["perc_exec"]), float(self.pol.running_cost), sep

    def final_state(self):
        return float(self.pol.running_cost)


class JaxRunner:
    """Drives this framework's PolicyTrainRL through the same contract."""

    def __init__(self, settings, seed=0, arch="ref"):
        from blockcopy_tpu.policy.policies import build_policy_from_settings
        settings = dict(settings)
        settings["block_policy_arch"] = arch
        settings["block_seed"] = seed
        self.name = f"jax_{arch}"
        self.pol = build_policy_from_settings(settings)
        self.meta = {"inputs": None, "outputs": None, "outputs_prev": None}
        self.clip_length = 0

    def reset(self):
        self.meta = {"inputs": None, "outputs": None, "outputs_prev": None}
        self.clip_length = 0

    def step(self, frame, dense_out):
        self.clip_length += 1
        nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))  # noqa: E731
        self.meta["inputs"] = nhwc(frame)
        self.meta = self.pol(self.meta)
        grid = np.asarray(self.meta["grid"])[0].astype(bool)
        prev = self.meta["outputs"]
        if prev is None:
            out = dense_out.copy()
            fs = frame.copy()
        else:
            prev_nchw = np.asarray(prev).transpose(0, 3, 1, 2)
            fs_nchw = np.asarray(
                self.meta["frame_state"]).transpose(0, 3, 1, 2)
            out = block_composite(prev_nchw, dense_out, grid)
            fs = block_composite(fs_nchw, frame, grid)
        self.meta["frame_state"] = nhwc(fs.astype(np.float32))
        self.meta["outputs_prev"] = self.meta["outputs"]
        self.meta["outputs"] = nhwc(out.astype(np.float32))
        train = self.clip_length % TRAIN_INTERVAL == 0
        self.meta = self.pol.optim(self.meta, train=train)
        sep = None
        if self.meta.get("_rl_probs") is not None:
            e, s = (float(x) for x in jax.device_get(self.meta["_rl_probs"]))
            sep = e - s
        return float(self.meta["perc_exec"]), float(self.pol.running_cost), sep

    def final_state(self):
        return float(self.pol.running_cost)


# ---------------------------------------------------------------------------


def run_one(runner, clips, tail_clips):
    rates, costs, seps = [], [], []
    t0 = time.time()
    for ci in range(clips):
        runner.reset()
        for frame, dense in make_clip(ci):
            r, c, sep = runner.step(frame, dense)
            rates.append(r)
            costs.append(c)
            if sep is not None:
                seps.append(sep)
    tail = rates[-tail_clips * CLIP_LEN:]
    # within-clip frames only (drop the forced all-exec first frames, which
    # inflate the raw mean by ~(1-p)/CLIP_LEN by construction)
    tail_free = [r for i, r in enumerate(rates) if i % CLIP_LEN != 0]
    tail_free = tail_free[-tail_clips * (CLIP_LEN - 1):]
    return {
        "impl": runner.name,
        "equilibrium_rate": float(np.mean(tail)),
        "equilibrium_rate_std": float(np.std(tail)),
        "equilibrium_rate_free_frames": float(np.mean(tail_free)),
        "running_cost_final": runner.final_state(),
        "prob_separation_final": float(np.mean(seps[-50:])) if seps else None,
        "seconds": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", type=str, default="0.25,0.5,0.75")
    ap.add_argument("--clips", type=int, default=60)
    ap.add_argument("--tail-clips", type=int, default=20)
    ap.add_argument("--impls", type=str, default="ref_torch,jax_ref,jax_fast")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="VALIDATION_fidelity.json")
    args = ap.parse_args()

    from blockcopy_tpu.core.argparser import default_settings

    results = {"geometry": f"{H}x{W} bs{BS} grid {GH}x{GW}",
               "clips": args.clips, "clip_len": CLIP_LEN,
               "tail_clips": args.tail_clips,
               "quantize": "1/16 (reference fixed value, policy.py:22)",
               "note": ("equilibrium_rate includes the forced all-exec "
                        "first frame of every clip (floor = "
                        "0.1 + 0.9*p for CLIP_LEN=10); "
                        "equilibrium_rate_free_frames drops them"),
               "targets": {}}
    for target in [float(t) for t in args.targets.split(",")]:
        settings = default_settings(
            block_target=target, block_num_classes=C, block_size=BS,
            block_quantize_number_exec=1.0 / 16.0)
        per = []
        for impl in args.impls.split(","):
            if impl == "ref_torch":
                r = TorchRunner(settings, seed=args.seed)
            elif impl.startswith("jax_"):
                r = JaxRunner(settings, seed=args.seed,
                              arch=impl.split("_", 1)[1])
            else:
                raise SystemExit(f"unknown impl {impl}")
            rec = run_one(r, args.clips, args.tail_clips)
            rec["target"] = target
            per.append(rec)
            print(json.dumps(rec), flush=True)
        results["targets"][str(target)] = per

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
