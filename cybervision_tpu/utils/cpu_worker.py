"""Clean-environment executor for host-side XLA:CPU stages.

This box's interpreters boot with an axon PJRT sitecustomize
(PYTHONPATH=/root/.axon_site, triggered by PALLAS_AXON_POOL_IPS) that
degrades XLA:CPU execution inside the TPU process — measured 15x on the
RANSAC LM refinement (0.04 s clean vs 0.60 s in-process) and the same
order on bundle adjustment; the repo's CLAUDE.md documents outright
fetch stalls. The TPU path itself is unaffected, but the pipeline's
host-side f64 stages (LM refinement, bundle adjustment) run on the CPU
backend and were eating the poisoning on every pair.

Fix: ONE persistent spawn-context subprocess whose environment drops
the plugin trigger. Same interpreter, same jaxlib, same code (the
worker imports the target function by name) — results are
bit-identical to running inline; only the runtime is clean. Falls back
to inline execution on any worker failure, and is bypassed entirely
when the current process is already clean (tests, --mode=cpu runs,
the bench's CPU fallback).

The first call pays the worker's jax import + compile (~seconds,
amortized by the persistent compile cache); subsequent calls cost
pickle transport (~ms at the pipeline's payload sizes).

Standard multiprocessing-spawn requirement: the ENTRY SCRIPT of any
process that reaches this worker must be import-safe (guard executable
code with `if __name__ == "__main__":`) — spawn re-imports the
parent's __main__ in the child. The package CLI (__main__.py) and
bench.py are guarded; ad-hoc scripts must be too.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
from typing import Any

_PROC = None
_CONN = None
_FAILED = False


def needs_clean_cpu() -> bool:
    """True when in-process XLA:CPU would run under the axon plugin."""
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def _worker_main(conn) -> None:  # pragma: no cover - subprocess body
    import importlib

    # The parent's compile-cache setup does not inherit; reuse it so LM/
    # BA programs compile once per machine, not once per worker.
    try:
        import jax

        from cybervision_tpu.utils.cache import machine_cache_dir

        jax.config.update(
            "jax_compilation_cache_dir",
            machine_cache_dir(
                os.path.join(
                    os.path.expanduser("~"), ".cache", "cybervision_tpu",
                    "jax",
                )
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    while True:
        try:
            msg = conn.recv()
        except EOFError:
            return
        if msg is None:
            return
        fn_path, args, kwargs = msg
        try:
            mod_name, fn_name = fn_path.rsplit(".", 1)
            fn = getattr(importlib.import_module(mod_name), fn_name)
            conn.send(("ok", fn(*args, **kwargs)))
        except BaseException as err:  # noqa: BLE001 - report, don't die
            import traceback

            conn.send(("err", f"{err}\n{traceback.format_exc()}"))


def _ensure_worker():
    global _PROC, _CONN, _FAILED
    if _FAILED:
        return None
    if _PROC is not None and _PROC.is_alive():
        return _CONN
    ctx = mp.get_context("spawn")
    parent, child = ctx.Pipe()
    # spawn re-execs the interpreter with a copy of os.environ taken at
    # start(): scrub the plugin trigger around it so the child boots a
    # clean XLA:CPU runtime.
    saved = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    saved_plat = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        proc = ctx.Process(target=_worker_main, args=(child,), daemon=True)
        proc.start()
    except Exception:
        _FAILED = True
        return None
    finally:
        if saved is not None:
            os.environ["PALLAS_AXON_POOL_IPS"] = saved
        if saved_plat is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = saved_plat
    child.close()
    _PROC, _CONN = proc, parent
    return parent


class WorkerUnavailable(RuntimeError):
    pass


def call(fn_path: str, *args: Any, **kwargs: Any) -> Any:
    """Run `fn_path`(*args, **kwargs) in the clean-CPU worker.

    Raises WorkerUnavailable when the worker can't be used (caller runs
    inline) and RuntimeError when the target function itself failed."""
    global _FAILED, _PROC, _CONN
    conn = _ensure_worker()
    if conn is None:
        raise WorkerUnavailable("clean-CPU worker unavailable")
    try:
        conn.send((fn_path, args, kwargs))
        status, payload = conn.recv()
    except Exception as err:
        _FAILED = True
        try:
            _PROC.kill()
        except Exception:
            pass
        _PROC = _CONN = None
        raise WorkerUnavailable(f"clean-CPU worker died: {err}") from err
    if status == "err":
        raise RuntimeError(f"clean-CPU worker call failed: {payload}")
    return payload


def shutdown() -> None:
    global _PROC, _CONN
    if _CONN is not None:
        try:
            _CONN.send(None)
        except Exception:
            pass
    if _PROC is not None:
        _PROC.join(timeout=2)
        if _PROC.is_alive():
            _PROC.kill()
    _PROC = _CONN = None


def _selftest_echo(x):  # used by tests
    import jax.numpy as jnp

    return type(x)(jnp.asarray(x) * 2) if isinstance(x, (int, float)) else x
