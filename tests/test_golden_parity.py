"""Golden reference-parity test (VERDICT round-1 item #6).

tests/fixtures/golden_dense.npz is the committed output of the literal
oracle (reference semantics, correlation/mod.rs:217-624) run end-to-end —
full coarse-to-fine pyramid, both directions, cross-checks — on the
deterministic golden scene (regenerate with tests/gen_golden_fixture.py).
The pipeline's correlate_images must match it within the BASELINE.md 1%
depth budget.

Also records the default (interval-relaxation) vs exact cross-check
delta on the same scene (VERDICT weak #6).
"""

import os

import numpy as np
import pytest

from cybervision_tpu.config import CorrelationConfig, ProjectionMode
from cybervision_tpu.ops import correlation as corr

from .golden_scene import F_HSHIFT, SCALE_MIN_SIZE, golden_scene

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_dense.npz")


class _Src:
    def __init__(self, img):
        self.img = img


@pytest.fixture(scope="module")
def golden():
    return np.load(FIXTURE)


def _depth(pos_x, pos_y, valid):
    ys, xs = np.nonzero(valid)
    return np.hypot(
        xs - pos_x[valid].astype(np.float64),
        ys - pos_y[valid].astype(np.float64),
    )


def _run_pipeline(exact=False):
    img1, img2, _ = golden_scene()
    cfg = CorrelationConfig(
        scale_min_size=SCALE_MIN_SIZE, exact_cross_check=exact
    )
    return corr.correlate_images(
        _Src(img1), _Src(img2), F_HSHIFT, ProjectionMode.AFFINE, cfg
    )


def test_pipeline_matches_golden_oracle(golden):
    out = _run_pipeline()
    mine_valid = out[:, :, 2] == 1
    o_valid = golden["valid"]

    # Valid-mask agreement (device resize vs host Lanczos and f32
    # boundary ties flip a few cells; gross disagreement means drift).
    both = mine_valid & o_valid
    union = mine_valid | o_valid
    assert o_valid.sum() > 2000
    assert both.sum() / union.sum() > 0.85, (
        f"mask IoU {both.sum() / union.sum():.3f}"
    )

    # Match positions: within one pixel of the oracle almost everywhere.
    dx = np.abs(out[:, :, 0][both] - golden["pos_x"][both])
    dy = np.abs(out[:, :, 1][both] - golden["pos_y"][both])
    assert ((dx <= 1) & (dy <= 1)).mean() > 0.95

    # BASELINE.md budget: depth within 1% of the reference CPU mode.
    # Depth is the affine disparity magnitude (triangulation.rs:313-330);
    # compare mean absolute delta normalized by the oracle's depth range.
    ys, xs = np.nonzero(both)
    d_mine = np.hypot(
        xs - out[:, :, 0][both].astype(np.float64),
        ys - out[:, :, 1][both].astype(np.float64),
    )
    d_oracle = np.hypot(
        xs - golden["pos_x"][both].astype(np.float64),
        ys - golden["pos_y"][both].astype(np.float64),
    )
    rng = d_oracle.max() - d_oracle.min()
    rel = np.abs(d_mine - d_oracle).mean() / rng
    assert rel < 0.01, f"normalized mean depth delta {rel:.4f} >= 1%"


def test_cross_check_default_vs_exact_delta(golden):
    """The default interval-bound cross-check is a relaxation of the
    reference's exact mutual test (ops.correlation.cross_check docstring).
    Record the end-to-end impact: the exact variant must stay within the
    same golden budget, and the relaxation must only add a small fraction
    of extra matches."""
    out_fast = _run_pipeline(exact=False)
    out_exact = _run_pipeline(exact=True)
    v_fast = out_fast[:, :, 2] == 1
    v_exact = out_exact[:, :, 2] == 1

    # Measured delta: the relaxation's extra survivors, as a fraction.
    extra = (v_fast & ~v_exact).sum() / max(v_exact.sum(), 1)
    assert extra < 0.10, f"relaxation adds {extra:.1%} extra matches"

    # Where both keep the pixel, the match is identical (the filter only
    # gates validity; it never changes positions).
    both = v_fast & v_exact
    np.testing.assert_array_equal(
        out_fast[:, :, :2][both], out_exact[:, :, :2][both]
    )

    # The exact variant also meets the golden 1% depth budget.
    o_valid = golden["valid"]
    b = v_exact & o_valid
    ys, xs = np.nonzero(b)
    d_mine = np.hypot(
        xs - out_exact[:, :, 0][b].astype(np.float64),
        ys - out_exact[:, :, 1][b].astype(np.float64),
    )
    d_oracle = np.hypot(
        xs - golden["pos_x"][b].astype(np.float64),
        ys - golden["pos_y"][b].astype(np.float64),
    )
    rng = d_oracle.max() - d_oracle.min()
    assert np.abs(d_mine - d_oracle).mean() / rng < 0.01
