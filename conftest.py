"""Root conftest: re-exec pytest with a healthy JAX environment.

This box boots every interpreter with an axon PJRT sitecustomize
(PYTHONPATH=/root/.axon_site, triggered by PALLAS_AXON_POOL_IPS) whose
registration poisons XLA:CPU execution — device->host fetches of jit
outputs stall or hang. sitecustomize runs before any pytest code, so the
only reliable fix is to relaunch pytest once with the trigger removed.
This lives in the rootdir conftest (not tests/conftest.py) so it runs
before pytest's output capture starts, keeping the child's output visible.
"""

import os
import sys


def _raise_map_count() -> None:
    """Best-effort bump of vm.max_map_count for the test run.

    XLA:CPU JIT-compiles hundreds of programs over a full suite run and
    each loads as many small mmaps — observed >27k maps 90 s into the
    suite, blowing through the kernel default of 65530 mid-run. mmap
    then fails ENOMEM, LLVM reports "Cannot allocate memory", and the
    process SEGFAULTs inside backend_compile. Needs root; silently a
    no-op otherwise (smaller runs stay under the default cap).
    """
    try:
        with open("/proc/sys/vm/max_map_count") as fh:
            if int(fh.read()) >= 1_048_576:
                return
        with open("/proc/sys/vm/max_map_count", "w") as fh:
            fh.write("1048576")
    except OSError:
        pass


_raise_map_count()

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("CVTPU_TEST_REEXEC") != "1"
    and "pytest" in sys.modules
):
    import subprocess

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["CVTPU_TEST_REEXEC"] = "1"
    rc = subprocess.run(
        [sys.executable, "-m", "pytest", *sys.argv[1:]], env=env
    ).returncode
    os._exit(rc)
