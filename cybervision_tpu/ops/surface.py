"""Surface / camera / track containers shared by triangulation and output.

Mirrors the reference's Surface (triangulation.rs:31-79), Track
(triangulation.rs:333-402) and Camera (triangulation.rs:404-507) with
array-first storage: tracks are a padded (N, n_images, 2) int32 array with
-1 marking missing projections, and 3D points an (N, 3) float64 array —
the layouts the TPU SFM kernels operate on directly.
"""

from __future__ import annotations

import dataclasses

import numpy as np

MISSING = -1


def rodrigues_matrix(r: np.ndarray) -> np.ndarray:
    """Rotation matrix from an axis-angle vector (triangulation.rs:475-485)."""
    theta = float(np.linalg.norm(r))
    if theta < np.finfo(np.float64).eps:
        return np.eye(3)
    u = r / theta
    ux = np.array(
        [[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]], dtype=np.float64
    )
    return (
        np.cos(theta) * np.eye(3)
        + (1.0 - np.cos(theta)) * np.outer(u, u)
        + np.sin(theta) * ux
    )


def rodrigues_vector(rm: np.ndarray) -> np.ndarray:
    """Axis-angle from a rotation matrix, Tomasi's decoding
    (triangulation.rs:414-455).

    Documented deviation: rho is read directly off the skew-symmetric
    a = (R - R')/2 (rho = [a21, a02, a10] = sin(theta)*u, the correct
    Tomasi form, so theta = atan2(sin, cos)). The reference SUBTRACTS THE
    MIRRORED ENTRIES AGAIN (rho = [a21-a12, ...] = 2 sin(theta)*u,
    triangulation.rs:417-421), decoding theta = atan2(2 sin, cos) — a 30
    degree rotation decodes as 49.1 degrees, does not round-trip through
    matrix_r, and since Camera::from_matrix REBUILDS r_matrix from the
    corrupted vector (rs:457-458), every upstream perspective camera
    rotation is distorted relative to its own E/P3P decomposition. This
    implementation round-trips exactly (tested)."""
    a = (rm - rm.T) / 2.0
    rho = np.array([a[2, 1], a[0, 2], a[1, 0]])
    s = float(np.linalg.norm(rho))
    c = (np.trace(rm) - 1.0) / 2.0
    eps = np.finfo(np.float64).eps
    if abs(s) < eps and abs(c - 1.0) < eps:
        return np.zeros(3)
    if abs(s) < eps and abs(c + 1.0) < eps:
        r_i = rm + np.eye(3)
        v = r_i[:, int(np.argmax(np.linalg.norm(r_i, axis=0)))]
        u = v / np.linalg.norm(v)
        r = u * np.pi
        if (
            (abs(r[0]) < eps and abs(r[1]) < eps and r[2] < 0)
            or (abs(r[0]) < eps and r[1] < 0)
            or r[0] < 0
        ):
            return -r
        return r
    u = rho / s
    theta = float(np.arctan2(s, c))
    return u * theta


@dataclasses.dataclass
class Camera:
    """Pinhole camera: K, axis-angle rotation r, translation t."""

    k: np.ndarray  # (3, 3)
    r: np.ndarray  # (3,) axis-angle
    t: np.ndarray  # (3,)

    def __post_init__(self):
        self.k = np.asarray(self.k, np.float64)
        self.r = np.asarray(self.r, np.float64)
        self.t = np.asarray(self.t, np.float64)
        self._update()

    def _update(self):
        self.r_matrix = rodrigues_matrix(self.r)
        self.center = -self.r_matrix.T @ self.t

    @classmethod
    def from_matrix(cls, k, rm, t) -> "Camera":
        return cls(k=np.asarray(k), r=rodrigues_vector(np.asarray(rm)), t=np.asarray(t))

    def update_params(self, delta_r, delta_t):
        self.r = self.r + delta_r
        self.t = self.t + delta_t
        self._update()

    def point_depth(self, p3d: np.ndarray) -> np.ndarray:
        """Depth along the optical axis (triangulation.rs:491-495).
        p3d: (..., 3)."""
        shifted = p3d + (self.r_matrix.T @ self.t)
        return shifted @ self.r_matrix[2]

    def point_in_front(self, p3d) -> np.ndarray:
        return self.point_depth(p3d) > 0

    def projection(self) -> np.ndarray:
        """(3, 4) projection matrix K [R|t] (triangulation.rs:502-506)."""
        p = np.concatenate([self.r_matrix, self.t[:, None]], axis=1)
        return self.k @ p


def affine_camera() -> Camera:
    """The reference's dummy camera for parallel projection
    (triangulation.rs:287-291): K = diag(1, 1, 0), identity pose. Projects
    (x, y, z) -> (x, y) with depth z."""
    return Camera.from_matrix(np.diag([1.0, 1.0, 0.0]), np.eye(3), np.zeros(3))


@dataclasses.dataclass
class Surface:
    """Reconstructed point cloud with per-image projections.

    points3d: (N, 3) float64 — every row is a valid 3D point.
    tracks:   (N, n_images, 2) int32, MISSING where the point was not seen.
    cameras:  per-image Camera list.
    """

    points3d: np.ndarray
    tracks: np.ndarray
    cameras: list
    # Set when every track's camera-0 projection is its own integer grid
    # pixel (the affine path): (h, w). Enables the direct grid Delaunay
    # in output.meshing.grid_mesh_polygons.
    grid_shape: tuple | None = None

    def __post_init__(self):
        assert self.points3d.ndim == 2 and self.points3d.shape[1] == 3
        assert self.tracks.ndim == 3 and self.tracks.shape[2] == 2
        assert len(self.points3d) == len(self.tracks)

    @property
    def n_points(self) -> int:
        return len(self.points3d)

    @property
    def n_images(self) -> int:
        return self.tracks.shape[1]

    @property
    def n_cameras(self) -> int:
        return len(self.cameras)

    def track_visible(self, camera_i: int) -> np.ndarray:
        return self.tracks[:, camera_i, 0] != MISSING

    def project_points(self, camera_i: int) -> np.ndarray:
        """Project all 3D points into a camera (triangulation.rs:63-74);
        affine cameras (w == 0) skip perspective division. Returns (N, 2)."""
        p = self.cameras[camera_i].projection()
        h = np.concatenate([self.points3d, np.ones((self.n_points, 1))], axis=1)
        proj = h @ p.T
        w = proj[:, 2]
        scale = np.where(np.abs(w) < np.finfo(np.float64).eps, 1.0, w)
        return proj[:, :2] / scale[:, None]

    def point_depths(self, camera_i: int) -> np.ndarray:
        return self.cameras[camera_i].point_depth(self.points3d)
