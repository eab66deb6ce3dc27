"""In-process A/B of a lowering flag on the DETECTION bench.

Detection analogue of tools/ab_flag.py: compiles BOTH variants of the
fused CSP-R50 detection stepper in ONE process and interleaves fenced
timing windows (A, B, A, B, ...).  Relay interference is one-sided
(windows only ever spike LOW), so the per-variant MAX over windows is
the least-biased point estimate; the median is the cross-check.

Usage:
  python tools/ab_flag_detection.py \
      --flag blockcopy_tpu.models.csp:HEAD_BLOCKED_FINAL
"""

import argparse
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flag", type=str, required=True,
                    help="'module.path:FLAG' module-level bool")
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--target", type=float, default=0.3)
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--policy-arch", type=str, default="fast")
    ap.add_argument("--values", type=str, default=None,
                    help="'off_val,on_val' for string-valued flags "
                    "(default: bool False,True)")
    args = ap.parse_args()

    from blockcopy_tpu.core.stepper import StepperConfig
    from blockcopy_tpu.models.csp import CSPConfig, init_csp
    from blockcopy_tpu.tasks.detection.stepper import DetectionStepper

    modpath, flagname = args.flag.split(":")
    flagmod = importlib.import_module(modpath)
    assert hasattr(flagmod, flagname), args.flag

    dtype = jnp.bfloat16
    frame_shape = (1, args.height, args.width, 3)
    gh, gw = args.height // 128, args.width // 128
    capacity = max(1, int(round(args.target * gh * gw)))

    csp_cfg = CSPConfig()
    params = init_csp(jax.random.PRNGKey(0), csp_cfg, dtype=dtype)
    scfg = StepperConfig(block_size=128, block_target=args.target,
                         train_interval=4, num_classes=1,
                         policy_arch=args.policy_arch)

    rs = np.random.RandomState(0)
    base = rs.randn(*frame_shape).astype(np.float32)

    def frame(t):
        f = base.copy()
        s = (t * 37) % (args.height - 200)
        f[:, s:s + 160, s:s + 160] += 2.0
        return jnp.asarray(f, dtype)

    staged = [jax.device_put(frame(10 + i)) for i in range(8)]

    def fence(s):
        return float(jnp.sum(s["dets"].astype(jnp.float32)))

    def parse_value(s):
        # bool flags: '0'/'false'/'off' must become False, not a truthy
        # string (advisor finding r4: --values 0,1 silently A/B'd on vs on)
        if isinstance(getattr(flagmod, flagname), bool):
            low = s.strip().lower()
            if low in ("0", "false", "off"):
                return False
            if low in ("1", "true", "on"):
                return True
            raise SystemExit(f"--values: {s!r} is not a bool "
                             f"(flag {args.flag} is bool-valued)")
        return s

    values = (False, True) if args.values is None \
        else tuple(parse_value(v) for v in args.values.split(",", 1))
    # Cache correctness (advisor finding r4): flags consumed inside
    # module-level @jax.jit functions used to be invisible to the jit cache
    # key, so the second variant could silently reuse the first variant's
    # cached jaxpr.  Fixed at the source: those functions (csp_decode /
    # multiclass_nms_fixed) now resolve the flag eagerly in a Python wrapper
    # and pass it as a STATIC argument, so each variant's stepper trace
    # (built below with the global set to its value) embeds its own variant.
    # jax.clear_caches() between builds is deliberately NOT used: it would
    # also drop the first variant's compiled executable, forcing a
    # mid-window retrace under the wrong global.
    variants = {}
    for name, flag in (("off", values[0]), ("on", values[1])):
        setattr(flagmod, flagname, flag)
        stepper = DetectionStepper(csp_cfg, scfg, frame_shape, capacity,
                                   dtype=dtype)
        state = stepper.init_state(params, jax.random.PRNGKey(1))
        first = jax.jit(stepper.first_step, donate_argnums=(1,))
        step = jax.jit(stepper.step, donate_argnums=(1,))
        state = first(params, state, frame(0))  # traces with current flag
        for t in range(1, args.warmup + 1):
            state = step(params, state, frame(t))
        fence(state)
        variants[name] = {"step": step, "state": state, "fps": [],
                          "flag": flag}
        print(f"compiled {args.flag}={name} (= {flag!r})", flush=True)

    for w in range(args.windows):
        for name, v in variants.items():
            # re-assert the variant's value so any retrace (host callbacks,
            # future cache eviction) traces under the right global
            setattr(flagmod, flagname, v["flag"])
            t0 = time.perf_counter()
            s = v["state"]
            for t in range(args.frames):
                s = v["step"](params, s, staged[t % len(staged)])
            checksum = fence(s)
            dt = time.perf_counter() - t0
            assert np.isfinite(checksum)
            v["state"] = s
            v["fps"].append(args.frames / dt)
            print(json.dumps({"window": w, "variant": name,
                              "fps": round(args.frames / dt, 2)}), flush=True)

    summary = {"flag": args.flag}
    for name, v in variants.items():
        summary[name] = {"max": round(float(np.max(v["fps"])), 2),
                         "median": round(float(np.median(v["fps"])), 2)}
    summary["on_over_off_max"] = round(
        summary["on"]["max"] / summary["off"]["max"], 4)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
