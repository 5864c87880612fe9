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

Residual risk (ADVICE r3/r4): this VM presents a STABLE virtualized
cpuinfo while migrating across physically different hosts, so XLA's
runtime microarch detection can still disagree with any tag derived
from guest-visible state. The canary below closes that window for
CPU-backend processes: at startup, one tiny XLA:CPU program is AOT
compiled with the persistent cache pointed at the candidate directory
while native stderr is captured; if the cached-executable loader
reports a machine-type/feature mismatch, the directory is re-keyed
(salt suffix) and the check repeats — a fresh directory always passes,
so a migration costs one cache rebuild instead of warnings or a SIGILL.
TPU-env processes skip the canary: their XLA:CPU work runs in clean-CPU
worker subprocesses (utils/cpu_worker.py), which run the canary
themselves, and XLA:CPU execution is unreliable under the axon
sitecustomize anyway.
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


def _canary_mismatch(path: str) -> bool:
    """AOT-compile one tiny XLA:CPU program with the persistent cache at
    `path`, capturing native stderr (the loader's mismatch warning is a
    C++ LOG, not a Python warning). True when a cached executable from a
    feature-incompatible host was loaded. A miss (empty dir / first run)
    stores the canary and returns False.

    The loader's "machine type doesn't match" warning alone is NOT the
    signal: measured on this box, a program stored and reloaded seconds
    later ON THE SAME HOST still warns, because XLA compiles with LLVM
    tuning pseudo-features (+prefer-no-scatter/+prefer-no-gather) that
    the loader's host-feature probe never reports. Those are codegen
    hints — they cannot SIGILL — so only missing REAL ISA features
    (avx512*, amx*, ...) count as a mismatch; re-keying on the tuning
    flags would rebuild the cache on every startup."""
    import re
    import tempfile

    import jax
    import jax.numpy as jnp

    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        with tempfile.TemporaryFile() as tmp:
            saved = os.dup(2)
            try:
                os.dup2(tmp.fileno(), 2)
                jax.jit(lambda x: (x * 1.000001 + 3.0).sum()).lower(
                    jax.ShapeDtypeStruct((64, 64), jnp.float32)
                ).compile()
            finally:
                os.dup2(saved, 2)
                os.close(saved)
            tmp.seek(0)
            err = tmp.read().decode("utf-8", "replace")
    except Exception:
        return False  # canary must never break startup
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min
        )
    missing = re.findall(
        r"Target machine feature \+([\w.\-]+) is not\s+supported", err
    )
    return any(not f.startswith("prefer-") for f in missing)


def _cpu_backend_process() -> bool:
    """CPU-backend process detection WITHOUT initializing jax backends:
    the axon remote-TPU env var marks TPU sessions (CLAUDE.md env
    discipline); everything else here runs XLA:CPU."""
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    return os.environ.get("JAX_PLATFORMS", "cpu").startswith("cpu")


def machine_cache_dir(base: str, canary: bool | None = None) -> str:
    """`base` suffixed with the CPU-feature tag (created if possible).

    On CPU-backend processes (canary=None auto-detects; pass False to
    skip, True to force) a startup canary validates that cached CPU AOT
    executables actually load cleanly on THIS host, re-keying with a
    salt suffix on mismatch — see the module docstring."""
    path = f"{base.rstrip('/')}-{cpu_feature_tag()}"
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return base
    if canary is None:
        canary = _cpu_backend_process() and os.environ.get(
            "CVTPU_CACHE_CANARY", "1"
        ) != "0"
    if canary:
        if path in _CANARY_VALIDATED:
            return _CANARY_VALIDATED[path]
        start = path
        for salt in range(1, 4):
            if not os.listdir(path) or not _canary_mismatch(path):
                break
            path = f"{base.rstrip('/')}-{cpu_feature_tag()}-s{salt}"
            try:
                os.makedirs(path, exist_ok=True)
            except OSError:
                return base
        _CANARY_VALIDATED[start] = path
    return path


# Per-process memo: the canary compile runs once per candidate directory,
# not once per pipeline run (_enable_compile_cache calls this per run).
_CANARY_VALIDATED: dict[str, str] = {}
