"""Shared shape-bucketing policy for device programs.

Data-dependent counts (keypoints, descriptors, matches, tracks) are
padded up to geometric buckets so every jitted program compiles once per
bucket instead of once per exact count (~45 s/program over the TPU
tunnel). This is THE single copy of that policy — the bucket grid is
compile-cache-critical, so every op module must draw from the same one.
"""

from __future__ import annotations


def pow2_bucket(
    n: int, floor: int = 1024, factor: int = 2, cap: int | None = None
) -> int:
    """Smallest floor * factor^k >= n, at least `floor`, at most `cap`
    (when given). factor=4 coarsens the grid for programs whose compiles
    are expensive enough that per-pair count wobble must land on one
    bucket (e.g. the multi-program RANSAC sweep)."""
    b = floor
    limit = n if cap is None else min(n, cap)
    while b < limit:
        b *= factor
    return b if cap is None else min(b, cap)


def step_bucket(n: int, step: int = 1024) -> int:
    """Smallest multiple of `step` >= n (at least one step). A finer grid
    than pow2_bucket — for the CPU backend, where compiles are local and
    cheap, so trimming pad rows beats minimizing program count (a pow2
    bucket wastes up to 2x rows; padding both sides of a matmul squares
    that)."""
    return max(step, ((n + step - 1) // step) * step)
