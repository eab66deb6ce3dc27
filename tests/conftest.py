import os

# Tests run on a virtual 8-device CPU mesh: multi-chip sharding is validated
# without TPU hardware (the driver separately dry-runs the multichip path).
# Note: the environment's sitecustomize force-registers the TPU platform, so
# the env var alone is not enough — jax.config must be set before first use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
