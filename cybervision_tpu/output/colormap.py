"""Depth colormap: reversed viridis with linear interpolation.

The reference embeds a 256-entry viridis table (from the public BIDS
colormap) indexed so value 0 maps to the yellow end (map_depth,
output.rs:1146-1229); matplotlib ships the same colormap, so the table is
sampled from there rather than embedded.
"""

from __future__ import annotations

import numpy as np


def _viridis_lut() -> np.ndarray:
    # Pre-sampled (256, 3) reversed-viridis table (value 0 -> yellow end,
    # like the reference); stored as package data to avoid a matplotlib
    # import on the output path.
    import os

    return np.load(
        os.path.join(os.path.dirname(__file__), "viridis_lut.npy")
    ).astype(np.float64)


_LUT = None


def map_depth(values: np.ndarray) -> np.ndarray:
    """Vectorized map_color (output.rs:1219-1229): piecewise-linear lookup
    into the 256-entry table. values: (...,) in [0, 1] -> (..., 3) uint8."""
    global _LUT
    if _LUT is None:
        _LUT = _viridis_lut()  # f64: the reference lerps in f64 and an
        # f32 lerp flips the +0.5 rounding near .5 channel boundaries.
    v = np.clip(np.asarray(values, np.float64) * 255.0, 0.0, 255.0)
    box = np.minimum(v.astype(np.int32), 254)
    ratio = (v - box)[..., None]
    c1 = _LUT[box]
    c2 = _LUT[box + 1]
    return (c2 * ratio + c1 * (1.0 - ratio) + 0.5).astype(np.uint8)
