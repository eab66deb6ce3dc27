"""Multi-host (multi-process) distributed startup.

The reference's scale-out entry is ``init_dist`` with pytorch/slurm/MPI
launchers (``Pedestron/mmdet/apis/env.py:13-51``) — dead code in its eval
path, but the capability exists.  The TPU-native analog is
``jax.distributed.initialize``: each process owns a slice of the pod's
chips, and SPMD programs sharded over the GLOBAL device list run
collectives over ICI/DCN without further host coordination.

This module wires that up launcher-agnostically:

- ``maybe_initialize()``: call once at CLI startup, BEFORE first device
  use.  Resolves coordinator/process-count/process-id from (in priority
  order) explicit arguments, torch-style env vars (``MASTER_ADDR`` /
  ``MASTER_PORT`` / ``WORLD_SIZE`` / ``RANK`` — the reference's pytorch
  launcher contract, ``env.py:22-29``), JAX-native env vars, or cloud-TPU
  metadata auto-detection.  Single-process (no signal of a second
  process) is an explicit NO-OP so the CLIs behave identically on one
  host.
- ``global_mesh(n_devices)``: a clip-parallel mesh over the global device
  list, validating divisibility by the process count so every host feeds
  the same number of local clips.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_initialized = False


def detect_env() -> Optional[dict]:
    """Resolve multi-process launch parameters from the environment.

    Returns None when nothing indicates a multi-process launch (the
    single-host case).  Mirrors the reference's ``_init_dist_pytorch``
    contract: world size + rank from env, coordinator from
    MASTER_ADDR:MASTER_PORT.
    """
    # torch-launcher style (reference env.py:22-29)
    if "WORLD_SIZE" in os.environ and int(os.environ["WORLD_SIZE"]) > 1:
        addr = os.environ.get("MASTER_ADDR", "127.0.0.1")
        port = os.environ.get("MASTER_PORT", "8476")
        return {
            "coordinator_address": f"{addr}:{port}",
            "num_processes": int(os.environ["WORLD_SIZE"]),
            "process_id": int(os.environ.get("RANK", "0")),
        }
    # JAX-native style
    if "JAX_NUM_PROCESSES" in os.environ \
            and int(os.environ["JAX_NUM_PROCESSES"]) > 1:
        return {
            "coordinator_address": os.environ.get(
                "JAX_COORDINATOR_ADDRESS", "127.0.0.1:8476"),
            "num_processes": int(os.environ["JAX_NUM_PROCESSES"]),
            "process_id": int(os.environ.get("JAX_PROCESS_ID", "0")),
        }
    return None


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize JAX's distributed runtime if this looks like a
    multi-process launch; otherwise do nothing.

    Explicit arguments win over env detection.  Returns True iff
    ``jax.distributed.initialize`` was called.  Idempotent.
    """
    global _initialized
    if _initialized:
        return True
    if num_processes is None:
        env = detect_env()
        if env is None:
            if coordinator_address is None:
                return False  # single-process: no-op
            # coordinator given but no count: defer to TPU-pod
            # auto-detection below
            env = {"coordinator_address": coordinator_address,
                   "num_processes": None, "process_id": None}
        coordinator_address = env["coordinator_address"]
        num_processes = env["num_processes"]
        process_id = env["process_id"]
    if num_processes is not None and num_processes <= 1:
        return False
    logger.info("jax.distributed.initialize(coordinator=%s, processes=%s, "
                "id=%s)", coordinator_address, num_processes, process_id)
    # On cloud TPU pods all three may be None: jax auto-detects from
    # metadata.  Must run before any other jax API touches the backend.
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def global_mesh(n_devices: Optional[int] = None):
    """Clip-parallel mesh over the GLOBAL device list (all hosts).

    ``n_devices`` counts global devices; it must be divisible by
    ``jax.process_count()`` so every host contributes the same number of
    clip lanes (each process feeds its addressable shard of the
    time-major batch).  Defaults to all global devices.
    """
    from blockcopy_tpu.parallel.clip_parallel import make_mesh

    procs = jax.process_count()
    devices = jax.devices()  # global across processes
    n = n_devices if n_devices is not None else len(devices)
    if n % procs != 0:
        raise ValueError(
            f"n_devices={n} not divisible by process count {procs}: every "
            f"host must drive the same number of clips")
    return make_mesh(n, devices=devices)


def local_batch_slice(n_devices: int):
    """Index range [lo, hi) of the global clip-lane batch owned by this
    process: the caller loads only its slice and assembles the global
    array with ``jax.make_array_from_process_local_data``."""
    procs = jax.process_count()
    per = n_devices // procs
    pid = jax.process_index()
    return pid * per, (pid + 1) * per
