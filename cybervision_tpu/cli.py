"""Flag-compatible command-line interface.

Mirrors the reference CLI exactly (main.rs:52-188): same flags, defaults,
usage text shape, and exit codes (2 for bad arguments, 1 for a failed
reconstruction). `--mode` gains TPU semantics: gpu -> TPU/XLA,
gpu-low-power -> smaller sweep chunks, cpu -> the same JAX program on the
CPU backend.
"""

from __future__ import annotations

import sys

from cybervision_tpu import __version__
from cybervision_tpu.config import (
    HardwareMode,
    InterpolationMode,
    MeshMode,
    ProjectionMode,
    ReconstructionConfig,
)

USAGE = """Usage: cybervision [OPTIONS] <IMG_SRC>... <IMG_OUT>

Arguments:
  <IMG_SRC>...  Source image(s)
  <IMG_OUT>     Output image

Options:
      --scale=<SCALE>                  Depth scale [default: -1]
      --focal-length=<FOCAL_LENGTH>    Focal length in 35mm equivalent
      --mode=<MODE>                    Hardware mode [default: gpu] [possible values: gpu, gpu-low-power, cpu]
      --interpolation=<INTERPOLATION>  Interpolation mode [default: delaunay] [possible values: delaunay, none]
      --no-bundle-adjustment           Skip bundle adjustment [if unspecified, bundle adjustment will be applied]
      --max-points=<MAX_POINTS>        Limit number of points in the resulting mesh
      --projection=<PROJECTION>        Projection mode [default: perspective] [possible values: parallel, perspective]
      --mesh=<MESH>                    Mesh options [default: vertex-colors] [possible values: plain, vertex-colors, texture-coordinates]
      --help                           Print help"""

_ENUMS = {
    "--mode": {
        "gpu": HardwareMode.TPU,
        "gpu-low-power": HardwareMode.TPU_LOW_MEMORY,
        "cpu": HardwareMode.CPU,
    },
    "--interpolation": {
        "delaunay": InterpolationMode.DELAUNAY,
        "none": InterpolationMode.NONE,
    },
    "--projection": {
        "parallel": ProjectionMode.AFFINE,
        "perspective": ProjectionMode.PERSPECTIVE,
    },
    "--mesh": {
        "plain": MeshMode.PLAIN,
        "vertex-colors": MeshMode.VERTEX_COLORS,
        "texture-coordinates": MeshMode.TEXTURE_COORDINATES,
    },
}


def parse_args(argv: list[str]):
    """Returns (config, img_src, img_out) or exits with code 2/0."""
    kw = {}
    filenames: list[str] = []
    for arg in argv:
        if arg.startswith("--") and not filenames:
            if arg == "--no-bundle-adjustment":
                kw["bundle_adjustment"] = False
                continue
            if arg == "--help":
                print(USAGE)
                raise SystemExit(0)
            name, sep, value = arg.partition("=")
            if not sep:
                print(f"Option flag {arg} has no value", file=sys.stderr)
                print(USAGE)
                raise SystemExit(2)
            if name == "--scale":
                kw["scale"] = _parse_num(name, value, float)
            elif name == "--focal-length":
                # The reference parses u32 — negatives are a parse
                # failure and exit 2 (main.rs Args::parse).
                kw["focal_length"] = _parse_num(name, value, _uint)
            elif name == "--max-points":
                kw["max_points"] = _parse_num(name, value, _uint)
            elif name in _ENUMS:
                try:
                    enum_val = _ENUMS[name][value]
                except KeyError:
                    noun = {
                        "--mode": "hardware mode",
                        "--interpolation": "interpolation",
                        "--projection": "projection",
                        "--mesh": "mesh vertex output mode",
                    }[name]
                    print(f"Unsupported {noun} {value}", file=sys.stderr)
                    print(USAGE)
                    raise SystemExit(2) from None
                field = {
                    "--mode": "hardware",
                    "--interpolation": "interpolation",
                    "--projection": "projection",
                    "--mesh": "mesh",
                }[name]
                kw[field] = enum_val
            else:
                # Reference-exact: an unknown --flag=value only warns and
                # parsing continues (main.rs:161-163 has no exit(2) in the
                # unknown-argument arm, unlike the bad-value arms).
                print(f"Unsupported argument {arg}", file=sys.stderr)
        else:
            filenames.append(arg)

    if not filenames:
        print("No filenames provided", file=sys.stderr)
        print(USAGE)
        raise SystemExit(2)
    img_out = filenames.pop()
    if len(filenames) < 2:
        print(
            "Not enough source images (need at least 2 to create a"
            f" stereopair), but only {len(filenames)} were specified:"
            f" {filenames}",
            file=sys.stderr,
        )
        print(USAGE)
        raise SystemExit(2)
    return ReconstructionConfig(**kw), filenames, img_out


def _uint(value: str) -> int:
    """Unsigned int, like the reference's u32/usize parses."""
    n = int(value)
    if n < 0:
        raise ValueError("invalid digit found in string")
    return n


def _parse_num(name, value, cast):
    try:
        return cast(value)
    except ValueError as err:
        print(
            f"Argument {name} has an unsupported value {value}: {err}",
            file=sys.stderr,
        )
        print(USAGE)
        raise SystemExit(2) from None


def _reexec_for_cpu_backend() -> None:
    """--mode=cpu needs a healthy XLA:CPU. Hosts that boot every
    interpreter with a remote-TPU PJRT sitecustomize (trigger env var
    PALLAS_AXON_POOL_IPS) poison CPU-backend execution — device->host
    fetches hang — and the sitecustomize runs before any of our code, so
    the only reliable fix is to relaunch once with the trigger removed
    (the same pattern as the test runner's conftest.py)."""
    import os

    if (
        not os.environ.get("PALLAS_AXON_POOL_IPS")
        or os.environ.get("CVTPU_CPU_REEXEC") == "1"
    ):
        return
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # The same hosts pin JAX_PLATFORMS to the remote plugin; --mode=cpu
    # explicitly targets the CPU backend, so force it.
    env["JAX_PLATFORMS"] = "cpu"
    env["CVTPU_CPU_REEXEC"] = "1"
    os.execve(
        sys.executable,
        [sys.executable, "-m", "cybervision_tpu", *sys.argv[1:]],
        env,
    )


def main(argv: list[str] | None = None) -> int:
    import os

    # Suppress the banner in the --mode=cpu re-exec child: the parent
    # already printed it (the reference prints one banner, main.rs:193).
    if os.environ.get("CVTPU_CPU_REEXEC") != "1":
        print(f"Cybervision-TPU version {__version__}")
    cfg, img_src, img_out = parse_args(
        argv if argv is not None else sys.argv[1:]
    )
    if cfg.hardware == HardwareMode.CPU and argv is None:
        # Only for real CLI invocations (argv is None): in-process
        # callers (tests) manage their own environment.
        _reexec_for_cpu_backend()

    from cybervision_tpu.reconstruction import reconstruct

    try:
        reconstruct(img_src, img_out, cfg)
    except Exception as err:  # reference exits 1 on any failure (main.rs:198-201)
        print(f"Reconstruction failed, root cause is {err}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
