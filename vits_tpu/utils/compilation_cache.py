"""Persistent XLA compilation cache.

The flagship train step takes minutes to compile; enabling JAX's persistent
cache makes every subsequent process start near-instant (the reference has
no equivalent concern — torch eager). Called by the train CLI and the
serving engine.

The cache directory is keyed by a host fingerprint: CPU AOT executables are
compiled for the build host's exact ISA feature set, and XLA will happily
load one compiled on a different machine ("could lead to execution errors
such as SIGILL"). A shared cache dir on a heterogeneous fleet then turns
into a crash source — observed in round 2 as a device thread dying
mid-collective. /proc/cpuinfo flags are NOT a sufficient fingerprint on
this fleet: VMs mask cpuinfo identically across physical hosts while
LLVM's CPUID-based host detection (which decides tuning features like
+prefer-no-gather) differs, so same-fingerprint dirs collided (observed
round 3). On CPU backends the fingerprint therefore also includes the
kernel boot id — the cache then never outlives the machine instance, which
still gives warm starts within a session. TPU executables are not
host-ISA-sensitive, so the TPU cache keeps the durable fingerprint.
Correctness probes (__graft_entry__.dryrun_multichip) skip the cache
entirely.
"""

from __future__ import annotations

import hashlib
import os
import platform

import jax


def _host_fingerprint() -> str:
    parts = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags") or line.startswith("Features"):
                    parts.append(line.strip())
                    break
    except OSError:
        parts.append(platform.processor() or "unknown-cpu")
    if jax.default_backend() == "cpu":
        # CPU AOT artifacts are sensitive to LLVM's CPUID-level host
        # detection, which cpuinfo does not capture on masked fleet VMs —
        # scope the cache to this boot so it can never cross machines.
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                parts.append(f.read().strip())
        except OSError:
            import uuid

            parts.append(str(uuid.getnode()))
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    cache_dir = cache_dir or os.environ.get(
        "VITS_TPU_COMPILE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", f"vits_tpu_xla_{_host_fingerprint()}"
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return cache_dir
