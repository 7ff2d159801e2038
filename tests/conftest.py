"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding is exercised on virtual CPU devices (the driver separately
dry-runs the multichip path); TPU-only tests are skipped when not on TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU aborts the process (SIGABRT, rc=134) when a collective rendezvous
# takes >40 s — on this 1-core host, 8 device threads time-slicing a busy
# core legitimately exceed that (observed killing test_2d_mesh_matches_1d
# mid-suite with the exact round-2 driver failure signature). Tests should
# wait, not die.
if "collective_call_terminate_timeout" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags

# The env var alone is not enough on hosts where a TPU PJRT plugin
# force-registers itself (observed with the 'axon' platform); the config
# update below reliably pins the backend to CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent XLA compile cache: the train-step/loop tests compile for minutes
# on CPU; cached across test sessions this drops to seconds
from vits_tpu.utils.compilation_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
