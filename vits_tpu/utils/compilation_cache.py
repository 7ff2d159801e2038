"""Persistent XLA compilation cache.

The flagship train step takes minutes to compile; enabling JAX's persistent
cache makes every subsequent process start near-instant (the reference has
no equivalent concern — torch eager). Called by the train CLI and the
serving engine.

The cache directory is keyed by a host fingerprint (platform + CPU feature
flags): CPU AOT executables are compiled for the build host's exact ISA
feature set, and XLA will happily load one compiled on a different machine
("could lead to execution errors such as SIGILL"). A shared cache dir on a
heterogeneous fleet then turns into a crash source — observed in round 2 as
a device thread dying mid-collective. Fingerprinting the dir makes foreign
artifacts unreachable. Correctness probes (__graft_entry__.dryrun_multichip)
additionally skip the cache entirely.
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
