"""Depth colormap: reversed viridis with linear interpolation.

The reference embeds a 256-entry viridis table (from the public BIDS
colormap) indexed so value 0 maps to the yellow end (map_depth,
output.rs:1146-1229); matplotlib ships the same colormap, so the table is
sampled from there rather than embedded.
"""

from __future__ import annotations

import numpy as np


def _viridis_lut() -> np.ndarray:
    import matplotlib

    cmap = matplotlib.colormaps["viridis"]
    lut = (np.asarray(cmap(np.linspace(0.0, 1.0, 256)))[:, :3] * 255.0).round()
    return lut[::-1].copy()  # value 0 -> yellow end, like the reference


_LUT = None


def map_depth(values: np.ndarray) -> np.ndarray:
    """Vectorized map_color (output.rs:1219-1229): piecewise-linear lookup
    into the 256-entry table. values: (...,) in [0, 1] -> (..., 3) uint8."""
    global _LUT
    if _LUT is None:
        _LUT = _viridis_lut()
    v = np.asarray(values, np.float64)
    step = 1.0 / 255.0
    box = np.clip(np.floor(v / step).astype(np.int64), 0, 254)
    ratio = (v - step * box) / step
    hi = np.where(v >= 1.0, 1.0, ratio)
    c1 = _LUT[np.where(v >= 1.0, 255, box)]
    c2 = _LUT[np.where(v >= 1.0, 255, box + 1)]
    out = c2 * hi[..., None] + c1 * (1.0 - hi[..., None])
    return np.round(out).astype(np.uint8)
