"""Machine-aware persistent-compile-cache directory selection.

XLA:CPU's persistent cache stores ahead-of-time executables specialized
to the compiling machine's CPU features; loading them on a host with a
different feature set is at best a warning and at worst a SIGILL
(observed: this VM migrates across heterogeneous hosts and a cached
avx512-tuned program hard-crashed the test suite). TPU executables don't
have this problem (compiled server-side for the attached chip), but the
same cache directory also collects the pipeline's XLA:CPU programs
(bundle adjustment, CPU fallbacks). Keying the directory by a machine
tag keeps caches warm per machine type and makes a migration a cache
miss instead of a crash.

The tag hashes /proc/cpuinfo's model name AND flags plus
platform.machine() and the jaxlib version: XLA derives LLVM target
features that cpuinfo does not expose (e.g. +prefer-no-gather tuning
picked per CPU *model*, and feature splits that change across XLA
releases — ADVICE r3), so flags alone still admitted cross-host loads
with "machine type doesn't match" warnings. Model+version is the
closest observable proxy for the actual compile-target feature set
(no public jax/jaxlib API exposes the LLVM host features themselves).

Residual risk, observed and accepted: this VM presents a STABLE
virtualized cpuinfo while migrating across physically different hosts,
so XLA's runtime microarch detection can still disagree with any tag
derived from guest-visible state — cross-host AOT loads then log
"machine type doesn't match" warnings (loads proceed; no SIGILL
observed since the tag landed). A guaranteed fix would need jaxlib to
expose its LLVM host features; until then the tag narrows the window
(model/arch/jaxlib changes miss instead of crash) rather than closing
it.
"""

from __future__ import annotations

import hashlib
import os
import platform


def cpu_feature_tag() -> str:
    """Short stable hash of this host's CPU identity as seen by XLA:CPU:
    cpuinfo model name + feature flags + machine arch + jaxlib version."""
    parts = [platform.machine()]
    try:
        import jaxlib

        parts.append(getattr(jaxlib, "__version__", "?"))
    except Exception:
        parts.append("nojaxlib")
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("model name"):
                    parts.append(line.split(":", 1)[1].strip())
                    break
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    parts.append(
                        " ".join(sorted(line.split(":", 1)[1].split()))
                    )
                    break
    except OSError:
        pass
    if len(parts) <= 2:
        parts.append("unknown")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def machine_cache_dir(base: str) -> str:
    """`base` suffixed with the CPU-feature tag (created if possible)."""
    path = f"{base.rstrip('/')}-{cpu_feature_tag()}"
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return base
    return path
