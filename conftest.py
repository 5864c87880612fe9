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
