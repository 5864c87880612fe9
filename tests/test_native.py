"""Native (C++) runtime kernels vs the numpy fallbacks."""

import numpy as np
import pytest

from cybervision_tpu.output import meshing

native = pytest.importorskip("cybervision_tpu.native")


def _random_tris(rng, n, size=60):
    proj = rng.uniform(2, size - 2, (n * 3, 2))
    depth = rng.uniform(1, 10, n * 3)
    polys = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    return proj, depth, polys


def test_rasterize_matches_python(rng):
    h = w = 64
    proj, depth, polys = _random_tris(rng, 40)
    valid = np.ones(len(proj), bool)

    out_native = np.full((h, w), -np.inf)
    pts_all = np.concatenate([proj, depth[:, None]], axis=1)
    native.rasterize_polygons_max(out_native, pts_all, valid, polys)

    out_py = np.full((h, w), -np.inf)
    for poly in polys:
        pts = np.stack([[proj[v, 0], proj[v, 1], depth[v]] for v in poly])
        xs, ys, vals = meshing.rasterize_polygon(pts, w - 1, h - 1)
        if len(xs):
            np.maximum.at(out_py, (ys, xs), vals)

    both = np.isfinite(out_native) & np.isfinite(out_py)
    only = np.isfinite(out_native) != np.isfinite(out_py)
    assert only.sum() == 0
    np.testing.assert_allclose(out_native[both], out_py[both], rtol=1e-12)


def test_polygons_obstruct_matches_python(rng):
    h = w = 64
    proj, depth, polys = _random_tris(rng, 30)
    buf = np.full((h, w), np.inf)
    pts_idx = rng.randint(0, 60, (200, 2))
    buf[pts_idx[:, 1], pts_idx[:, 0]] = rng.uniform(0.5, 12, 200)

    res_native = native.polygons_obstruct(buf, proj, depth, polys)

    # Python reference from meshing's fallback loop.
    eps = np.finfo(np.float64).eps
    res_py = np.zeros(len(polys), bool)
    for i, tri in enumerate(polys):
        pts = np.stack([np.concatenate([proj[v], [depth[v]]]) for v in tri])
        xs, ys, vals = meshing.rasterize_polygon(pts, w, h)
        if len(xs) == 0:
            continue
        pd = buf[ys, xs]
        res_py[i] = bool(np.any(np.isfinite(pd) & (pd - vals > eps)))

    np.testing.assert_array_equal(res_native, res_py)


def test_format_obj(rng):
    verts = rng.uniform(-100, 100, (50, 3))
    txt = native.format_obj_vertices(verts)
    lines = txt.splitlines()
    assert len(lines) == 50
    for line, v in zip(lines, verts):
        parts = line.split()
        assert parts[0] == "v"
        np.testing.assert_allclose([float(x) for x in parts[1:]], v, rtol=0)

    colors = rng.uniform(0, 1, (50, 3))
    txt = native.format_obj_vertices(verts, colors)
    assert txt.splitlines()[0].count(" ") == 6

    faces = rng.randint(1, 1000, (20, 3)).astype(np.int32)
    ftxt = native.format_obj_faces(faces)
    flines = ftxt.splitlines()
    assert len(flines) == 20
    assert flines[0] == f"f {faces[0,0]} {faces[0,1]} {faces[0,2]}"


def test_format_obj_vertices_colored_long_lines(rng):
    """Worst-case shortest-round-trip doubles with colors: typical scaled
    colored lines run ~150 bytes, which overflowed the old 120-bytes/line
    output buffer (heap corruption). Every line must round-trip exactly."""
    n = 4096
    verts = (rng.uniform(-1, 1, (n, 3))) * 1e-300  # long mantissa + exponent
    colors = rng.uniform(0, 1, (n, 3))
    txt = native.format_obj_vertices(verts, colors)
    lines = txt.splitlines()
    assert len(lines) == n
    for i in (0, 1, n // 2, n - 1):
        parts = lines[i].split()
        assert parts[0] == "v" and len(parts) == 7
        np.testing.assert_array_equal(
            [float(x) for x in parts[1:4]], verts[i]
        )
        np.testing.assert_array_equal(
            [float(x) for x in parts[4:7]], colors[i]
        )


def test_ply_write_failure_raises(rng):
    """A mid-body write error (ENOSPC via /dev/full) must surface as
    OutputError, not a successful return with a truncated file."""
    import os

    if not os.path.exists("/dev/full"):
        pytest.skip("/dev/full not available")
    from cybervision_tpu.errors import OutputError

    word = np.full((8, 8), 1 << 24, np.int32)  # all pixels valid
    with pytest.raises(OutputError):
        native.ply_write_corr_grid("/dev/full", word, (1.0, 1.0, 1.0))


def test_format_obj_uvs_and_faces_uv(rng):
    uvs = rng.uniform(0, 1, (30, 2))
    txt = native.format_obj_uvs(uvs)
    lines = txt.splitlines()
    assert len(lines) == 30
    for line, (u, v) in zip(lines, uvs):
        parts = line.split()
        assert parts[0] == "vt"
        np.testing.assert_array_equal([float(parts[1]), float(parts[2])], [u, v])

    faces = rng.randint(1, 99999, (25, 3)).astype(np.int32)
    uvi = rng.randint(1, 99999, (25, 3)).astype(np.int32)
    ftxt = native.format_obj_faces_uv(faces, uvi)
    flines = ftxt.splitlines()
    assert len(flines) == 25
    f, u = faces[0], uvi[0]
    assert flines[0] == f"f {f[0]}/{u[0]} {f[1]}/{u[1]} {f[2]}/{u[2]}"


def test_delaunay_int_valid_and_matches_qhull_counts(rng):
    """The exact-integer Delaunay must produce a valid Delaunay
    triangulation: same triangle count as Qhull (equal by Euler's formula
    for any triangulation of the same hull), all CCW, total area = hull
    area, and the empty-circumcircle property on a sampled subset."""
    from scipy.spatial import ConvexHull, Delaunay

    h, w = 60, 83
    idx = rng.choice(h * w, 1500, replace=False)
    pts = np.stack([idx % w, idx // w], axis=1).astype(np.int32)

    tris = native.delaunay_int(pts)
    ref = Delaunay(pts.astype(np.float64))
    assert tris is not None and len(tris) == len(ref.simplices)

    p = pts.astype(np.float64)
    e1 = p[tris[:, 1]] - p[tris[:, 0]]
    e2 = p[tris[:, 2]] - p[tris[:, 0]]
    cross = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    assert (cross > 0).all()
    assert abs(0.5 * cross.sum() - ConvexHull(p).volume) < 1e-9

    sample = rng.choice(len(tris), 100, replace=False)
    for ti in sample:
        a, b, c = p[tris[ti]]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
                 + c[0] * (a[1] - b[1]))
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1])
              + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0])
              + (c @ c) * (b[0] - a[0])) / d
        r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        d2 = (p[:, 0] - ux) ** 2 + (p[:, 1] - uy) ** 2
        assert (d2 > r2 - 1e-6 * max(r2, 1.0)).all()

    # Degenerate inputs: all-collinear -> zero triangles; tiny n -> None.
    assert len(native.delaunay_int(
        np.array([[0, 0], [1, 1], [2, 2], [3, 3]], np.int32))) == 0
    assert native.delaunay_int(np.array([[0, 0], [1, 1]], np.int32)) is None


def _random_tracks(rng, t=4000, n_img=5, w=320, h=256):
    """Clustered tracks with missing entries: many tracks share image-0
    pixels so real merging happens."""
    from cybervision_tpu.ops.sfm import MISSING, TrackStore

    pts = np.full((t, n_img, 2), MISSING, np.int32)
    # image-0 anchor pixels, clustered (divide coords by 4 -> collisions)
    pts[:, 0, 0] = rng.randint(0, w // 3, t) * 3 % w
    pts[:, 0, 1] = rng.randint(0, h // 3, t) * 3 % h
    for m in range(1, n_img):
        vis = rng.rand(t) < 0.7
        # near the anchor, with outlier jumps sprinkled in
        dx = rng.randint(-2, 3, t) + np.where(rng.rand(t) < 0.05, 40, 0)
        dy = rng.randint(-2, 3, t)
        pts[vis, m, 0] = np.clip(pts[vis, 0, 0] + dx[vis], 0, w - 1)
        pts[vis, m, 1] = np.clip(pts[vis, 0, 1] + dy[vis], 0, h - 1)
    # a handful not visible in image 0 at all (must be dropped)
    drop = rng.rand(t) < 0.1
    pts[drop, 0] = MISSING
    store = TrackStore(n_img)
    store.append(pts)
    return store


def test_merge_tracks_native_matches_numpy(rng):
    from cybervision_tpu.ops.sfm import TrackStore, _merge_tracks_numpy

    w, h = 320, 256
    store = _random_tracks(rng, w=w, h=h)
    for image_i, r, max_d2 in [(0, 2, 10), (1, 2, 10), (0, 1, 4), (2, 3, 100)]:
        merged_native = native.merge_tracks_image(
            store.pts, image_i, w, h, r, max_d2
        )
        ref = _merge_tracks_numpy(store, image_i, (w, h), r, max_d2)
        np.testing.assert_array_equal(merged_native, ref.pts)

    # empty store
    empty = TrackStore(3)
    out = native.merge_tracks_image(empty.pts, 0, w, h, 2, 10)
    assert out.shape == (0, 3, 2)


def test_ply_write_delta_grid_matches_corr_grid(rng, tmp_path):
    """The 2-byte delta-grid writer must be byte-identical to the word
    writer on equivalent grids (in-range deltas), vertex colors on."""
    h, w = 40, 56
    valid = (rng.uniform(size=(h, w)) < 0.7).astype(np.int32)
    col = np.arange(w, dtype=np.int32)[None, :]
    row = np.arange(h, dtype=np.int32)[:, None]
    # In-image positions (like the real grid), deltas within [-64, 63].
    x2 = np.clip(col + rng.randint(-64, 64, (h, w)), 0, w - 1)
    y2 = np.clip(row + rng.randint(-64, 64, (h, w)), 0, h - 1)
    dx, dy = x2 - col, y2 - row
    word = ((x2 & 0xFFF) | ((y2 & 0xFFF) << 12) | (valid << 24)).astype(
        np.int32
    )
    d16 = (
        ((dx + 64) & 0x7F) | (((dy + 64) & 0x7F) << 7) | (valid << 14)
    ).astype(np.uint16)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    scale = (1.0, 1.0, -2.5)
    pa, pb = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
    fa = native.ply_write_corr_grid(pa, word, scale, img)
    fb = native.ply_write_delta_grid(pb, d16, scale, img)
    assert fa == fb
    assert open(pa, "rb").read() == open(pb, "rb").read()
