"""Configuration for the reconstruction pipeline.

The reference keeps all tuning as compile-time constants scattered across
module tops (orb.rs:30-41, pointmatching.rs:8-9, fundamentalmatrix.rs:16-30,
correlation/mod.rs:15-31, triangulation.rs:15-29, output.rs:21).  Here they
are lifted into dataclasses with the same defaults, switched by projection
mode, so tests and the CLI can override them.
"""

from __future__ import annotations

import dataclasses
import enum
import math


class ProjectionMode(enum.Enum):
    """Camera projection model (reference: main.rs:25-29)."""

    AFFINE = "parallel"  # SEM parallel projection
    PERSPECTIVE = "perspective"


class HardwareMode(enum.Enum):
    """Compute-path selection (reference: main.rs:12-17).

    TPU is the native path (replacing the reference's gpu/Vulkan+Metal);
    CPU runs the same JAX program on the CPU backend (replacing the
    reference's rayon fallback); TPU_LOW_MEMORY mirrors gpu-low-power by
    shrinking sweep chunk sizes.
    """

    TPU = "gpu"
    TPU_LOW_MEMORY = "gpu-low-power"
    CPU = "cpu"


class InterpolationMode(enum.Enum):
    """Surface interpolation (reference: main.rs:19-23)."""

    DELAUNAY = "delaunay"
    NONE = "none"


class MeshMode(enum.Enum):
    """Mesh vertex output options (reference: main.rs:31-36)."""

    PLAIN = "plain"
    VERTEX_COLORS = "vertex-colors"
    TEXTURE_COORDINATES = "texture-coordinates"


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB feature extraction (reference: orb.rs:30-41)."""

    fast_threshold: int = 15
    fast_num_points: int = 9  # contiguous arc length for FAST-9/16
    fast_kernel_size: int = 3  # circle radius border
    keypoint_scale_min_size: int = 256  # pyramid stops at this min dimension
    harris_kernel_width: int = 7  # HARRIS_KERNEL_SIZE*2+1
    harris_k: float = 0.04
    blur_kernel_width: int = 11  # ORB_GAUSS_KERNEL_WIDTH
    patch_width: int = 31  # ORB_PATCH_WIDTH (orientation centroid)
    max_keypoints: int = 10_000
    descriptor_bits: int = 256
    # BRIEF sampling pattern: "opencv" = the learned bit_pattern_31_
    # table the reference embeds (orb.rs:474-732; public OpenCV
    # constants), "gaussian" = fixed-seed isotropic Gaussian over the
    # 31x31 patch (original BRIEF construction). Both work (any fixed
    # pattern shared by both images does); the A/B in docs/PERF.md
    # round-5 picks the default (VERDICT r4 next #6).
    pattern: str = "gaussian"
    pattern_seed: int = 0x9E3779B9


@dataclasses.dataclass(frozen=True)
class MatchingConfig:
    """Brute-force Hamming descriptor matching (reference: pointmatching.rs:8-9)."""

    threshold_affine: int = 32
    threshold_perspective: int = 48

    def threshold(self, projection: ProjectionMode) -> int:
        if projection == ProjectionMode.AFFINE:
            return self.threshold_affine
        return self.threshold_perspective


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    """Fundamental-matrix RANSAC (reference: fundamentalmatrix.rs:16-30)."""

    top_inliers: int = 5_000  # sample from this many best matches
    min_inlier_distance: int = 10  # px separation between sampled matches
    ransac_k_affine: int = 1_000_000
    ransac_k_perspective: int = 1_000_000
    ransac_n_affine: int = 4
    ransac_n_perspective: int = 7
    ransac_t_affine: float = 0.1
    ransac_t_perspective: float = 10.0 / 1000.0  # x max image dimension
    ransac_d_affine: int = 10
    ransac_d_perspective: int = 200
    ransac_d_early_exit_affine: int = 1_000
    ransac_d_early_exit_perspective: int = 50_000
    check_interval: int = 50_000  # device batch per early-exit check
    rank_epsilon: float = 0.001
    # TPU deviation from the reference: instead of running a 7-point LM
    # refinement inside every perspective RANSAC iteration
    # (fundamentalmatrix.rs:201-205), the top_k_refine best hypotheses are
    # LM-refined after the batched sweep. Same accuracy contract, removes a
    # serial inner loop from the device-batched hot path (SURVEY.md §7).
    top_k_refine: int = 8
    seed: int = 0

    def params(self, projection: ProjectionMode) -> tuple[int, int, float, int, int]:
        """(k, n, t, d, d_early_exit) for the projection mode."""
        if projection == ProjectionMode.AFFINE:
            return (
                self.ransac_k_affine,
                self.ransac_n_affine,
                self.ransac_t_affine,
                self.ransac_d_affine,
                self.ransac_d_early_exit_affine,
            )
        return (
            self.ransac_k_perspective,
            self.ransac_n_perspective,
            self.ransac_t_perspective,
            self.ransac_d_perspective,
            self.ransac_d_early_exit_perspective,
        )


@dataclasses.dataclass(frozen=True)
class CorrelationConfig:
    """Dense cross-correlation (reference: correlation/mod.rs:15-31)."""

    scale_min_size: int = 64  # pyramid stops at this min dimension
    kernel_size: int = 5  # NCC window = 11x11
    threshold_affine: float = 0.6
    threshold_perspective: float = 0.5
    min_stdev_affine: float = 1.0
    min_stdev_perspective: float = 1.0
    corridor_size_affine: int = 2  # lateral stripes each side
    corridor_size_perspective: int = 4
    neighbor_distance: int = 10  # px window for search-range estimation
    corridor_extend_range_affine: float = 1.0
    corridor_extend_range_perspective: float = 0.5
    corridor_min_range_affine: float = 2.5
    corridor_min_range_perspective: float = 0.75
    cross_check_search_area: int = 4
    # Mutual-consistency filter variant. False = interval-bound relaxation
    # (separable per-axis min/max dilation + one gather; a strict superset
    # of the exact survivors, see ops.correlation.cross_check). True = the
    # reference-exact 9x9 window test (correlation/mod.rs:552-624) as a
    # batched 81-offset gather. Measured on a v5e at 1024^2 (affine
    # pyramid): 0.64 s relaxed vs 8.6 s exact — far over the 10% budget
    # that would justify flipping the default, so the relaxation stays;
    # tests/test_golden_parity.py bounds its effect (<10% extra matches,
    # same 1% depth budget).
    exact_cross_check: bool = False
    # Static half-width buckets for the per-pixel corridor window at refine
    # scales: the smallest bucket >= the observed max corridor length is
    # compiled (one XLA program per bucket per shape, cached).
    corridor_window_buckets: tuple[int, ...] = (8, 16, 24, 32, 64, 128)
    # Fixed corridor half-width (pixels each side of the window center).
    # When set, every refine scale uses this static window and the whole
    # pyramid runs without device->host syncs (one fetch at the end);
    # corridors wider than this are truncated. None restores the
    # reference's fully data-driven window via per-scale bucket queries
    # (correlation/mod.rs:530-538).
    corridor_window_fixed: int | None = 16
    # Truncation guard for the fixed window: the fused pyramid also
    # reduces the max corridor half-width any refine level wanted; when
    # it exceeds corridor_window_fixed the run escalates to the
    # data-driven bucket path (corridor_window_fixed=None) and reruns —
    # wide-disparity scenes keep reference corridor semantics
    # (correlation/mod.rs:530-538) at the cost of one scalar fetch per
    # pair (~30 ms on the TPU tunnel). False trusts the fixed window.
    corridor_window_escalate: bool = True
    # Low-power window clamp: --mode=gpu-low-power shrinks the sweep
    # window the way the reference shrinks corridor segments
    # (gpu/mod.rs:31-35), bounding per-dispatch VMEM/HBM residency.
    corridor_window_low_memory: int = 8

    @property
    def kernel_width(self) -> int:
        return self.kernel_size * 2 + 1

    @property
    def kernel_point_count(self) -> int:
        return self.kernel_width * self.kernel_width

    def threshold(self, projection: ProjectionMode) -> float:
        if projection == ProjectionMode.AFFINE:
            return self.threshold_affine
        return self.threshold_perspective

    def min_stdev(self, projection: ProjectionMode) -> float:
        if projection == ProjectionMode.AFFINE:
            return self.min_stdev_affine
        return self.min_stdev_perspective

    def corridor_size(self, projection: ProjectionMode) -> int:
        if projection == ProjectionMode.AFFINE:
            return self.corridor_size_affine
        return self.corridor_size_perspective

    def corridor_min_range(self, projection: ProjectionMode) -> float:
        if projection == ProjectionMode.AFFINE:
            return self.corridor_min_range_affine
        return self.corridor_min_range_perspective

    def corridor_extend_range(self, projection: ProjectionMode) -> float:
        if projection == ProjectionMode.AFFINE:
            return self.corridor_extend_range_affine
        return self.corridor_extend_range_perspective


@dataclasses.dataclass(frozen=True)
class TriangulationConfig:
    """Sparse/dense SFM triangulation (reference: triangulation.rs:15-29)."""

    bundle_adjustment_max_iterations: int = 100
    # Tracks per Schur-assembly chunk: bounds BA's live jacobian block to
    # O(chunk * cameras), like the reference's 10k-track parallel chunks
    # (triangulation.rs:1690).
    ba_track_chunk: int = 10_000
    extend_tracks_search_radius: int = 3
    merge_tracks_search_radius: int = 2
    merge_tracks_max_distance: int = 10
    tracks_radius_denominator: int = 1000
    perspective_scale_threshold: float = 1e-4
    ransac_n: int = 3  # P3P
    ransac_k: int = 100_000
    ransac_inliers_t: float = 50.0 / 1000.0  # x max dimension
    ransac_t: float = 50.0 / 1000.0
    ransac_d_percent: int = 70
    ransac_d_percent_early_exit: int = 95
    check_interval: int = 1000
    min_angle_between_rays: float = (0.5 / 180.0) * math.pi
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class OutputConfig:
    """Meshing / writers (reference: output.rs:21)."""

    max_center_distance: float = 4.0  # clip projections this far off-image
    # Affine surfaces are integer-grid samples: inside the valid region
    # every unit-quad edge already satisfies the empty-circumcircle
    # property, so the grid triangulation IS a Delaunay triangulation
    # there and is computed directly (output.meshing.grid_mesh_polygons)
    # instead of running Qhull (5-10 s at 1024^2). False restores the
    # generic Delaunay, which additionally bridges holes and the convex
    # hull with sliver triangles.
    grid_mesh: bool = True


@dataclasses.dataclass(frozen=True)
class ReconstructionConfig:
    """Top-level pipeline configuration (reference: main.rs:38-50 Args)."""

    scale: float = -1.0  # output depth scale
    focal_length: int | None = None  # 35mm-equivalent override
    hardware: HardwareMode = HardwareMode.TPU
    interpolation: InterpolationMode = InterpolationMode.DELAUNAY
    bundle_adjustment: bool = True
    max_points: int | None = None
    projection: ProjectionMode = ProjectionMode.PERSPECTIVE
    mesh: MeshMode = MeshMode.VERTEX_COLORS

    orb: OrbConfig = OrbConfig()
    matching: MatchingConfig = MatchingConfig()
    ransac: RansacConfig = RansacConfig()
    correlation: CorrelationConfig = CorrelationConfig()
    triangulation: TriangulationConfig = TriangulationConfig()
    output: OutputConfig = OutputConfig()


def optimal_scale_steps(dimensions: tuple[int, int], min_size: int) -> int:
    """Number of pyramid halvings until min(dims) reaches min_size.

    Reference: orb.rs:407-415 and correlation/mod.rs:542-550 (identical
    formula with different min_size).
    """
    min_dimension = min(dimensions)
    if min_dimension <= min_size:
        return 0
    return int(math.floor(math.log2(min_dimension / min_size)))


def pyramid_scales(dimensions: tuple[int, int], min_size: int) -> list[float]:
    """Coarse-to-fine scales 1/2^n ... 1.0 (reference: reconstruction.rs:565-566)."""
    steps = optimal_scale_steps(dimensions, min_size)
    return [1.0 / (1 << (steps - i)) for i in range(steps + 1)]
