"""Delaunay meshing with cross-camera occlusion culling.

Reference (output.rs:356-519): per camera, 2D Delaunay triangulation of
the projected visible tracks (spade bulk_load, output.rs:425); for
multi-camera surfaces, a polygon is removed if it obstructs a nearer
known point in any other camera's view (point z-buffer + polygon scanline
rasterization, output.rs:256-354); polygons are deduplicated across
cameras and grouped by camera index.

Here Delaunay comes from scipy (Qhull), the point z-buffer is a vectorized
scatter-min, and the scanline rasterizer follows the reference's edge
interpolation (output.rs:107-254) so depth-map output matches. A C++
rasterizer (cybervision_tpu.native) accelerates the per-polygon loops
when built; the numpy path is the always-available fallback.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy.spatial import Delaunay, QhullError

from cybervision_tpu.config import InterpolationMode, OutputConfig
from cybervision_tpu.ops.surface import Surface

def _pairwise_distinct(ipts: np.ndarray) -> bool:
    """True when no two integer points coincide. Scalar int64 keys beat
    np.unique(axis=0)'s structured-void sort ~15x at 500k points; a flag
    array makes it O(n) outright when the bounding box is small (it
    always is for pixel clouds: <=4096^2)."""
    d = ipts.astype(np.int64)
    lo = d.min(axis=0)
    ext = d.max(axis=0) - lo + 1
    keys = (d[:, 1] - lo[1]) * ext[0] + (d[:, 0] - lo[0])
    prod = int(ext[0] * ext[1])
    if prod <= (1 << 26):  # <= 64 MB of transient flags
        flags = np.zeros(prod, bool)
        flags[keys] = True
        return int(np.count_nonzero(flags)) == len(keys)
    return np.unique(keys).size == len(keys)


def _delaunay_simplices(pts: np.ndarray) -> np.ndarray | None:
    """Delaunay triangulation of a projected point cloud; None when the
    cloud is degenerate (the reference skips such cameras, output.rs:425
    via spade's failure path).

    Integer clouds — the affine pipeline's --max-points pixel subsample —
    take the exact native Bowyer–Watson (~5x faster than Qhull at 500k
    points); float projections (perspective cameras) use Qhull. Both
    return one of the valid Delaunay triangulations; on the cocircular
    ties a pixel grid is full of, implementations legitimately differ
    (the reference's spade is a third answer)."""
    pts = np.asarray(pts, np.float64)
    if (
        len(pts) >= 3
        and np.abs(pts).max(initial=0.0) < (1 << 25)
        and not np.any(pts != np.floor(pts))
    ):
        ipts = pts.astype(np.int32)
        # The native kernel requires pairwise-distinct points (Qhull
        # merges duplicates itself).
        if _pairwise_distinct(ipts):
            try:
                from cybervision_tpu import native

                tris = native.delaunay_int(ipts)
            except ImportError:
                tris = None
            if tris is not None:
                return tris
    try:
        return Delaunay(pts).simplices
    except QhullError:
        return None


def img_range(
    image_size: tuple[int, int],
    max_center_distance: float = OutputConfig.max_center_distance,
) -> tuple[tuple[float, float], tuple[float, float]]:
    """Acceptable projection range: within +-max_center_distance image
    sizes of the center (output.rs:613-622, constant at output.rs:21).
    image_size is (width, height)."""
    cx = image_size[0] / 2.0
    cy = image_size[1] / 2.0
    return (
        (cx - image_size[0] * max_center_distance, cx + image_size[0] * max_center_distance),
        (cy - image_size[1] * max_center_distance, cy + image_size[1] * max_center_distance),
    )


def grid_index(surface: Surface) -> np.ndarray:
    """(h, w) int32 pixel-index grid of an integer-grid surface: track
    index at its camera-0 pixel, -1 where no track exists."""
    h, w = surface.grid_shape
    xs = surface.tracks[:, 0, 0].astype(np.int64)
    ys = surface.tracks[:, 0, 1].astype(np.int64)
    idx = np.full((h, w), -1, np.int32)
    idx[ys, xs] = np.arange(surface.n_points, dtype=np.int32)
    return idx


def grid_mesh_polygons(surface: Surface) -> np.ndarray:
    """Direct Delaunay triangulation of an integer-grid surface.

    The affine path samples one track per valid pixel, so camera-0
    projections are points of the unit grid. Every edge and diagonal of a
    fully-valid 2x2 quad has an empty circumcircle (no third integer
    point fits inside a unit or sqrt2-diameter circle through two
    adjacent corners), so splitting each valid quad into two triangles
    yields a true Delaunay triangulation of the union of valid quads —
    the 4 cocircular corners make the diagonal choice exactly the
    tie-break freedom spade/Qhull also resolve arbitrarily
    (output.rs:425). Quads with 3 valid corners emit that triangle.

    Documented deviation: hull- and hole-bridging simplices, which a
    global Delaunay run would add across unmeasured regions, are omitted
    (they are long slivers spanning pixels with no correlation data).
    """
    idx = grid_index(surface)

    try:
        from cybervision_tpu.native import grid_mesh_triangles
    except ImportError:
        grid_mesh_triangles = None
    if grid_mesh_triangles is not None:
        # Same triangle set as the numpy path below, emitted quad-by-quad
        # in one C pass (the numpy path's 6 intermediate 2M-row arrays
        # cost ~1 s on the bursty host vCPU).
        return grid_mesh_triangles(idx)

    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, :-1].ravel()
    d = idx[1:, 1:].ravel()
    va, vb, vc, vd = a >= 0, b >= 0, c >= 0, d >= 0
    n_valid = (
        va.astype(np.int8) + vb.astype(np.int8)
        + vc.astype(np.int8) + vd.astype(np.int8)
    )

    tris = []
    all4 = n_valid == 4
    tris.append(np.stack([a[all4], b[all4], d[all4]], axis=1))
    tris.append(np.stack([a[all4], d[all4], c[all4]], axis=1))
    only3 = n_valid == 3
    for present, corners in (
        (va, (b, d, c)),
        (vb, (a, d, c)),
        (vc, (a, b, d)),
        (vd, (a, b, c)),
    ):
        m = only3 & ~present
        tris.append(np.stack([t[m] for t in corners], axis=1))

    return canonical_polygons(np.concatenate(tris).astype(np.int32))


def canonical_polygons(simplices: np.ndarray) -> np.ndarray:
    """Rotate each triangle so the smallest vertex index is first while
    preserving cyclic order (Polygon::new, output.rs:55-67)."""
    s = simplices
    first = np.argmin(s, axis=1)
    idx = (first[:, None] + np.arange(3)[None, :]) % 3
    return np.take_along_axis(s, idx, axis=1)


def rasterize_polygon(points: np.ndarray, max_x: int, max_y: int):
    """Scanline rasterization of one projected triangle with linearly
    interpolated values; yields (x, y, value) arrays.

    points: (3, 3) rows (x, y, value); follows the reference's iterator
    (output.rs:107-254): vertices sorted by y, rows floor(y0)..ceil(y2+1),
    the 'start' edge a->b (or b->c past b, or when b-c is horizontal-ish),
    the 'end' edge a->c, inclusive [0,1] coverage test per pixel.
    """
    pts = points[np.argsort(points[:, 1], kind="stable")]
    a, b, c = pts
    eps = np.finfo(np.float64).eps
    y_min = int(np.clip(np.floor(a[1]), 0, max_y))
    y_max = int(np.clip(np.ceil(c[1] + 1.0), 0, max_y))
    out_x, out_y, out_v = [], [], []
    for y in range(y_min, y_max):
        fy = float(y)
        if fy < a[1] or fy > c[1]:
            continue
        bc_dx = b[0] - c[0]
        degenerate_bc = abs((b[1] - c[1]) / bc_dx) < eps if bc_dx != 0 else False
        if fy < b[1] or degenerate_bc:
            denom = b[1] - a[1]
            coeff = (fy - a[1]) / denom if denom != 0 else np.inf
            start_x = a[0] * (1.0 - coeff) + b[0] * coeff
            start_v = pts[0, 2] * (1.0 - coeff) + pts[1, 2] * coeff
        else:
            denom = c[1] - b[1]
            coeff = (fy - b[1]) / denom if denom != 0 else np.inf
            start_x = b[0] * (1.0 - coeff) + c[0] * coeff
            start_v = pts[1, 2] * (1.0 - coeff) + pts[2, 2] * coeff
        denom = c[1] - a[1]
        coeff = (fy - a[1]) / denom if denom != 0 else np.inf
        end_x = a[0] * (1.0 - coeff) + c[0] * coeff
        end_v = pts[0, 2] * (1.0 - coeff) + pts[2, 2] * coeff

        if not (np.isfinite(start_x) and np.isfinite(end_x)):
            continue
        if start_x > end_x:
            start_x, end_x = end_x, start_x
            start_v, end_v = end_v, start_v
        x_lo = int(np.clip(np.floor(start_x), 0, max_x))
        x_hi = int(np.clip(np.ceil(end_x + 1.0), 0, max_x))
        if x_hi <= x_lo:
            continue
        span = end_x - start_x
        if span == 0:
            # Reference: x_c = 0/0 = NaN fails the [0,1] test, so a
            # zero-width scanline (triangle apex) emits NO pixel
            # (output.rs:225-231).
            continue
        xs = np.arange(x_lo, x_hi, dtype=np.float64)
        x_c = (xs - start_x) / span
        inside = (x_c >= 0.0) & (x_c <= 1.0)
        if not inside.any():
            continue
        xs = xs[inside]
        vals = start_v * (1.0 - x_c[inside]) + x_c[inside] * end_v
        out_x.append(xs.astype(np.int64))
        out_y.append(np.full(len(xs), y, dtype=np.int64))
        out_v.append(vals)
    if not out_x:
        return (
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros(0, np.float64),
        )
    return np.concatenate(out_x), np.concatenate(out_y), np.concatenate(out_v)


def _depth_buffer(
    surface: Surface, camera_j: int, image_size, max_center_distance: float
) -> np.ndarray | None:
    """Nearest-point z-buffer for one camera (DepthBuffer::new,
    output.rs:261-318). Returns (H, W) float64 with +inf for empty."""
    visible = surface.track_visible(camera_j)
    proj = surface.project_points(camera_j)
    depth = surface.point_depths(camera_j)
    (rx0, rx1), (ry0, ry1) = img_range(image_size, max_center_distance)
    ok = (
        visible
        & (proj[:, 0] > rx0)
        & (proj[:, 0] < rx1)
        & (proj[:, 1] > ry0)
        & (proj[:, 1] < ry1)
    )
    if not ok.any():
        return None
    px = proj[ok, 0]
    py = proj[ok, 1]
    pz = depth[ok]
    w = int(np.ceil(px.max())) + 1
    h = int(np.ceil(py.max())) + 1
    buf = np.full((h, w), np.inf)
    ix = np.clip(np.round(px).astype(np.int64), 0, w - 1)
    iy = np.clip(np.round(py).astype(np.int64), 0, h - 1)
    np.minimum.at(buf, (iy, ix), pz)
    return buf


def _polygon_obstructs(buf, proj, depth, polys) -> np.ndarray:
    """Vector of bools: polygon hides a nearer known point in this view
    (polygon_obstructs, output.rs:320-354)."""
    try:
        from cybervision_tpu.native import polygons_obstruct as native_obstruct
    except Exception:
        native_obstruct = None
    h, w = buf.shape
    eps = np.finfo(np.float64).eps
    if native_obstruct is not None:
        return native_obstruct(buf, proj, depth, polys)
    out = np.zeros(len(polys), bool)
    for i, tri in enumerate(polys):
        pts = np.stack(
            [np.concatenate([proj[v], [depth[v]]]) for v in tri], axis=0
        )
        xs, ys, vals = rasterize_polygon(pts, w, h)
        if len(xs) == 0:
            continue
        pd = buf[ys, xs]
        out[i] = bool(np.any(np.isfinite(pd) & (pd - vals > eps)))
    return out


@dataclasses.dataclass
class Mesh:
    surface: Surface
    polygons: np.ndarray  # (M, 3) int32 track indices, canonical rotation
    polygon_cameras: np.ndarray  # (M,) int32


def build_mesh(
    surface: Surface,
    image_dimensions: list[tuple[int, int]],
    interpolation: InterpolationMode,
    progress=None,
    output_cfg: OutputConfig = OutputConfig(),
) -> Mesh:
    """Mesh::create (output.rs:363-519)."""
    mcd = output_cfg.max_center_distance
    if interpolation != InterpolationMode.DELAUNAY or surface.n_points == 0:
        return Mesh(
            surface,
            np.zeros((0, 3), np.int32),
            np.zeros((0,), np.int32),
        )

    if output_cfg.grid_mesh and surface.grid_shape is not None:
        polys = grid_mesh_polygons(surface)
        if progress is not None:
            progress.report_status(0.9)
        return Mesh(surface, polys, np.zeros(len(polys), np.int32))

    all_polys = []
    all_cams = []
    n_cams = surface.n_cameras
    # Cameras with identical projection matrices produce identical
    # triangulations that the cross-camera dedup would discard anyway
    # (the affine stereo pair shares one dummy camera,
    # triangulation.rs:287-292) — process one representative each.
    proj_keys = [surface.cameras[i].projection().tobytes() for i in range(n_cams)]
    seen: dict = {}
    for camera_i in range(n_cams):
        if proj_keys[camera_i] in seen:
            continue
        seen[proj_keys[camera_i]] = camera_i
        visible = surface.track_visible(camera_i)
        proj = surface.project_points(camera_i)
        (rx0, rx1), (ry0, ry1) = img_range(image_dimensions[camera_i], mcd)
        ok = (
            visible
            & (proj[:, 0] > rx0)
            & (proj[:, 0] < rx1)
            & (proj[:, 1] > ry0)
            & (proj[:, 1] < ry1)
        )
        track_idx = np.nonzero(ok)[0]
        if len(track_idx) < 3:
            continue
        simplices = _delaunay_simplices(proj[ok])
        if simplices is None:
            continue
        polys = canonical_polygons(track_idx[simplices].astype(np.int32))

        # Occlusion culling against every other camera with a DISTINCT
        # projection (output.rs:457-508); identical-projection cameras
        # (the affine pair) are skipped, matching the reference's
        # perspective-only culling (output.rs:458).
        keep = np.ones(len(polys), bool)
        for camera_j in range(n_cams):
            if (
                camera_j == camera_i
                or proj_keys[camera_j] == proj_keys[camera_i]
                or not keep.any()
            ):
                continue
            buf = _depth_buffer(
                surface, camera_j, image_dimensions[camera_j], mcd
            )
            if buf is None:
                continue
            proj_j = surface.project_points(camera_j)
            depth_j = surface.point_depths(camera_j)
            sub = polys[keep]
            obstructs = _polygon_obstructs(buf, proj_j, depth_j, sub)
            k = keep.copy()
            k[np.nonzero(keep)[0][obstructs]] = False
            keep = k
        polys = polys[keep]
        all_polys.append(polys)
        all_cams.append(np.full(len(polys), camera_i, np.int32))
        if progress is not None:
            progress.report_status(0.9 * (camera_i + 1) / max(n_cams, 1))

    if not all_polys:
        return Mesh(surface, np.zeros((0, 3), np.int32), np.zeros((0,), np.int32))

    if len(all_polys) == 1:
        # Single contributing camera (e.g. the affine pair's shared dummy
        # camera): Delaunay triangles are already unique, so the
        # cross-camera dedup below would be a pure reorder — skip it
        # (0.5 s of lexsort at 1M triangles). Face order is then the
        # triangulator's emission order; the reference makes no ordering
        # promise (its HashMap dedup is iteration-order arbitrary,
        # output.rs:515-516).
        return Mesh(surface, all_polys[0], all_cams[0])

    polys = np.concatenate(all_polys)
    cams = np.concatenate(all_cams)
    # Dedup by vertex triple, keeping the first camera (output.rs:515-516),
    # then group by camera for the OBJ material switcher (output.rs:384).
    order = np.lexsort((polys[:, 2], polys[:, 1], polys[:, 0]))
    polys = polys[order]
    cams = cams[order]
    uniq = np.ones(len(polys), bool)
    uniq[1:] = np.any(polys[1:] != polys[:-1], axis=1)
    polys = polys[uniq]
    cams = cams[uniq]
    order = np.argsort(cams, kind="stable")
    return Mesh(surface, polys[order], cams[order])
