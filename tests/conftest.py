"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding is exercised on virtual CPU devices (the driver separately
dry-runs the multichip path); TPU-only tests are skipped when not on TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The env var alone is not enough on hosts where a TPU PJRT plugin
# force-registers itself (observed with the 'axon' platform); the config
# update below reliably pins the backend to CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compile cache: the train-step/loop tests compile for minutes
# on CPU; cached across test sessions this drops to seconds
from vits_tpu.utils.compilation_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
