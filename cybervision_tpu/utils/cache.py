"""Machine-aware persistent-compile-cache directory selection.

XLA:CPU's persistent cache stores ahead-of-time executables specialized
to the compiling machine's CPU features; loading them on a host with a
different feature set is at best a warning and at worst a SIGILL
(observed: this VM migrates across heterogeneous hosts and a cached
avx512-tuned program hard-crashed the test suite). TPU executables don't
have this problem (compiled server-side for the attached chip), but the
same cache directory also collects the pipeline's XLA:CPU programs
(bundle adjustment, CPU fallbacks). Keying the directory by a hash of
the host's CPU feature flags keeps caches warm per machine type and
makes a migration a cache miss instead of a crash.
"""

from __future__ import annotations

import hashlib
import os


def cpu_feature_tag() -> str:
    """Short stable hash of this host's CPU feature flags."""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.md5(
                        " ".join(sorted(line.split(":", 1)[1].split())).encode()
                    ).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


def machine_cache_dir(base: str) -> str:
    """`base` suffixed with the CPU-feature tag (created if possible)."""
    path = f"{base.rstrip('/')}-{cpu_feature_tag()}"
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return base
    return path
