"""Surface containers, meshing, and writer tests (output.rs behaviors)."""

import numpy as np
import pytest
from PIL import Image

from cybervision_tpu.config import InterpolationMode, MeshMode
from cybervision_tpu.ops import surface as surf
from cybervision_tpu.ops.affine_triangulation import triangulate_affine
from cybervision_tpu.output import meshing, writers
from cybervision_tpu.output.colormap import map_depth


def test_rodrigues_roundtrip(rng):
    for _ in range(10):
        r = rng.uniform(-1.5, 1.5, 3)
        rm = surf.rodrigues_matrix(r)
        np.testing.assert_allclose(rm @ rm.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(rm), 1.0, atol=1e-12)
        r2 = surf.rodrigues_vector(rm)
        np.testing.assert_allclose(r2, r, atol=1e-9)
    np.testing.assert_allclose(surf.rodrigues_matrix(np.zeros(3)), np.eye(3))


def test_camera_projection_and_depth():
    k = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]])
    cam = surf.Camera.from_matrix(k, np.eye(3), np.array([0.0, 0.0, 2.0]))
    p = np.array([[1.0, 0.5, 8.0]])
    proj = cam.projection() @ np.append(p[0], 1.0)
    proj = proj[:2] / proj[2]
    assert proj[0] == pytest.approx(50 + 100 * 1.0 / 10.0)
    assert proj[1] == pytest.approx(40 + 100 * 0.5 / 10.0)
    assert cam.point_depth(p)[0] == pytest.approx(10.0)
    np.testing.assert_allclose(cam.center, [0, 0, -2.0])


def test_affine_triangulation():
    grid = np.zeros((8, 10, 3), np.int64)
    grid[3, 4] = (7, 3, 1)  # pure horizontal disparity 3
    grid[5, 6] = (6, 5, 1)  # pure horizontal disparity 0
    grid[2, 2] = (5, 6, 1)  # dx=-3, dy=-4 -> dist 5
    s = triangulate_affine(grid)
    assert s.n_points == 3
    by_xy = {(int(p[0]), int(p[1])): p[2] for p in s.points3d}
    assert by_xy[(4, 3)] == pytest.approx(3.0)
    assert by_xy[(6, 5)] == pytest.approx(0.0)
    assert by_xy[(2, 2)] == pytest.approx(5.0)
    # Affine cameras project (x, y, z) -> (x, y).
    proj = s.project_points(0)
    np.testing.assert_allclose(proj, s.points3d[:, :2])
    np.testing.assert_allclose(s.point_depths(0), s.points3d[:, 2])


def test_canonical_polygons():
    tris = np.array([[5, 2, 9], [1, 7, 3], [8, 6, 4]])
    out = meshing.canonical_polygons(tris)
    np.testing.assert_array_equal(out, [[2, 9, 5], [1, 7, 3], [4, 8, 6]])


def test_rasterize_polygon_covers_interior():
    pts = np.array([[2.0, 2.0, 0.0], [12.0, 2.0, 10.0], [2.0, 12.0, 20.0]])
    xs, ys, vals = meshing.rasterize_polygon(pts, 20, 20)
    assert len(xs) > 30
    # Interpolated value at a known interior point: v = x-2 + 2*(y-2).
    for x, y, v in zip(xs, ys, vals):
        b = (x - 2) + 2 * (y - 2)
        assert v == pytest.approx(b, abs=1.5), (x, y)
    # Corners included, outside excluded.
    pix = set(zip(xs.tolist(), ys.tolist()))
    assert (3, 3) in pix
    assert (13, 13) not in pix


def _toy_surface():
    grid = np.zeros((20, 20, 3), np.int64)
    for y in range(5, 15):
        for x in range(5, 15):
            grid[y, x] = (x - 2, y, 1)
    return triangulate_affine(grid)


def test_build_mesh_delaunay():
    s = _toy_surface()
    mesh = meshing.build_mesh(
        s, [(20, 20), (20, 20)], InterpolationMode.DELAUNAY
    )
    assert len(mesh.polygons) > 100
    # Canonical rotation: first vertex is the smallest.
    assert (mesh.polygons.argmin(axis=1) == 0).all()
    # No duplicate triangles.
    keys = {tuple(p) for p in mesh.polygons}
    assert len(keys) == len(mesh.polygons)
    # Interpolation NONE produces no polygons.
    mesh2 = meshing.build_mesh(s, [(20, 20), (20, 20)], InterpolationMode.NONE)
    assert len(mesh2.polygons) == 0


def test_grid_mesh_polygons():
    """The affine grid mesh is a valid Delaunay triangulation of the
    union of valid quads: covers exactly that area, no duplicate or
    degenerate triangles, unit-quad edge lengths only."""
    h, w = 6, 7
    grid = np.zeros((h, w, 3), np.int64)
    grid[:, :, 0] = np.arange(w)[None, :] + 1  # disparity 1
    grid[:, :, 1] = np.arange(h)[:, None]
    grid[:, :, 2] = 1
    grid[2, 3, 2] = 0  # a hole
    grid[0, 0, 2] = 0  # a corner hole
    s = triangulate_affine(grid)
    polys = meshing.grid_mesh_polygons(s)

    pts = s.tracks[:, 0].astype(np.float64)
    tri_pts = pts[polys]  # (M, 3, 2)
    # Signed areas are +-1/2 (grid triangles), never degenerate.
    e1 = tri_pts[:, 1] - tri_pts[:, 0]
    e2 = tri_pts[:, 2] - tri_pts[:, 0]
    areas = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    np.testing.assert_allclose(areas, 0.5)
    # Total area = valid full quads + half-quads from 3-corner cases.
    valid = grid[:, :, 2] == 1
    quad_n = (
        valid[:-1, :-1].astype(int) + valid[:-1, 1:]
        + valid[1:, :-1] + valid[1:, 1:]
    )
    expect_area = (quad_n == 4).sum() * 1.0 + (quad_n == 3).sum() * 0.5
    assert areas.sum() == expect_area
    # Canonical rotation + uniqueness (same contract as build_mesh).
    assert (polys.argmin(axis=1) == 0).all()
    assert len({tuple(p) for p in polys}) == len(polys)
    # The hole's pixel is in no triangle.
    hole_idx = np.nonzero((s.tracks[:, 0, 0] == 3) & (s.tracks[:, 0, 1] == 2))
    assert len(hole_idx[0]) == 0

    # build_mesh dispatches to the grid path for grid surfaces.
    mesh = meshing.build_mesh(s, [(w, h), (w, h)], InterpolationMode.DELAUNAY)
    assert len(mesh.polygons) == len(polys)


def _parse_ply(path):
    with open(path, "rb") as fh:
        data = fh.read()
    head, _, body = data.partition(b"end_header\n")
    lines = head.decode().splitlines()
    nv = int([l for l in lines if l.startswith("element vertex")][0].split()[-1])
    nf = int([l for l in lines if l.startswith("element face")][0].split()[-1])
    with_color = any("red" in l for l in lines)
    stride = 24 + (3 if with_color else 0)
    verts = []
    cols = []
    for i in range(nv):
        rec = body[i * stride : (i + 1) * stride]
        verts.append(np.frombuffer(rec[:24], ">f8"))
        if with_color:
            cols.append(np.frombuffer(rec[24:], "u1"))
    faces = []
    off = nv * stride
    for i in range(nf):
        rec = body[off + i * 13 : off + (i + 1) * 13]
        assert rec[0] == 3
        faces.append(np.frombuffer(rec[1:], ">i4"))
    return np.array(verts), np.array(cols) if cols else None, np.array(faces)


def test_write_ply_roundtrip(tmp_path, rng):
    s = _toy_surface()
    mesh = meshing.build_mesh(s, [(20, 20), (20, 20)], InterpolationMode.DELAUNAY)
    img = rng.randint(0, 255, (20, 20, 3), dtype=np.uint8)
    path = str(tmp_path / "out.ply")
    writers.write_ply(path, mesh, [img, img], MeshMode.VERTEX_COLORS, (1.0, 1.0, -1.0))
    verts, cols, faces = _parse_ply(path)
    assert len(verts) == s.n_points
    assert len(faces) == len(mesh.polygons)
    # Vertex layout: (x, -y, -z) for out_scale (1, 1, -1) (output.rs:738-742).
    np.testing.assert_allclose(verts[:, 0], s.points3d[:, 0])
    np.testing.assert_allclose(verts[:, 1], -s.points3d[:, 1])
    np.testing.assert_allclose(verts[:, 2], -s.points3d[:, 2])
    # Colors sampled at the track's image-0 position.
    t0 = s.tracks[:, 0]
    np.testing.assert_array_equal(cols, img[t0[:, 1], t0[:, 0]])
    # Faces reversed (v2, v1, v0).
    np.testing.assert_array_equal(faces, mesh.polygons[:, ::-1])


def test_write_obj(tmp_path, rng):
    s = _toy_surface()
    mesh = meshing.build_mesh(s, [(20, 20), (20, 20)], InterpolationMode.DELAUNAY)
    img = rng.randint(0, 255, (20, 20, 3), dtype=np.uint8)
    path = str(tmp_path / "out.obj")
    writers.write_obj(path, mesh, [img, img], MeshMode.VERTEX_COLORS, (1.0, 1.0, 1.0))
    lines = open(path).read().splitlines()
    v_lines = [l for l in lines if l.startswith("v ")]
    f_lines = [l for l in lines if l.startswith("f ")]
    assert len(v_lines) == s.n_points
    assert len(f_lines) == len(mesh.polygons)
    first = v_lines[0].split()
    assert len(first) == 7  # v x y z r g b
    fidx = [int(p) for p in f_lines[0].split()[1:]]
    assert fidx == [mesh.polygons[0][2] + 1, mesh.polygons[0][1] + 1, mesh.polygons[0][0] + 1]

    # Texture mode: .mtl + per-image textures + v/vt faces.
    path2 = str(tmp_path / "tex.obj")
    writers.write_obj(path2, mesh, [img, img], MeshMode.TEXTURE_COORDINATES, (1, 1, 1))
    assert (tmp_path / "tex.mtl").exists()
    assert (tmp_path / "tex-0.png").exists()
    lines = open(path2).read().splitlines()
    assert lines[0] == "mtllib tex.mtl"
    vt = [l for l in lines if l.startswith("vt ")]
    assert len(vt) == int((s.tracks[:, :, 0] != surf.MISSING).sum())
    assert any(l.startswith("usemtl Textured") for l in lines)
    assert "/" in [l for l in lines if l.startswith("f ")][0]

    # A pre-started TextureEncoder (the orchestrator's overlap path) must
    # produce byte-identical .obj and texture files.
    path3 = str(tmp_path / "pre.obj")
    writers.write_obj(
        path3, mesh, [img, img], MeshMode.TEXTURE_COORDINATES, (1, 1, 1),
        texture_encoder=writers.TextureEncoder([img, img]),
    )
    assert open(path3, "rb").read().replace(b"pre", b"tex") == open(
        path2, "rb"
    ).read()
    for i in range(2):
        assert (
            (tmp_path / f"pre-{i}.png").read_bytes()
            == (tmp_path / f"tex-{i}.png").read_bytes()
        )
    # An encoder whose image set doesn't match is ignored, not misused.
    path4 = str(tmp_path / "mis.obj")
    writers.write_obj(
        path4, mesh, [img, img], MeshMode.TEXTURE_COORDINATES, (1, 1, 1),
        texture_encoder=writers.TextureEncoder([img]),
    )
    assert (tmp_path / "mis-1.png").exists()

    # Source-copy lane: a vetted PNG source is copied verbatim, a None
    # entry still encodes.
    src = str(tmp_path / "src.png")
    Image.fromarray(img).save(src, compress_level=9)
    path5 = str(tmp_path / "cp.obj")
    writers.write_obj(
        path5, mesh, [img, img], MeshMode.TEXTURE_COORDINATES, (1, 1, 1),
        texture_encoder=writers.TextureEncoder([img, img], [src, None]),
    )
    assert (tmp_path / "cp-0.png").read_bytes() == open(src, "rb").read()
    assert np.array_equal(
        np.asarray(Image.open(tmp_path / "cp-1.png").convert("RGB")), img
    )


def test_depth_image_writer(tmp_path):
    s = _toy_surface()
    mesh = meshing.build_mesh(s, [(20, 20), (20, 20)], InterpolationMode.DELAUNAY)
    path = str(tmp_path / "depth.png")
    writers.write_depth_image(path, mesh, [(20, 20), (20, 20)], 0, -1.0)
    img = np.asarray(Image.open(path))
    assert img.shape[2] == 4
    filled = img[:, :, 3] == 255
    assert filled.sum() > 80
    # Constant disparity plane -> constant color where filled.
    cols = img[filled][:, :3]
    assert (cols == cols[0]).all()


def test_depth_image_fractional_min_offsets(tmp_path):
    """Splat cells use offset = proj - RAW min with half-away-from-zero
    rounding (output.rs:1048-1060). Regression: flooring the min (and
    numpy banker's rounding) shifted both points here one column right:
    offsets 0.0/0.9 -> cols 0/1, not floored 0.6/1.5 -> cols 1/2."""
    grid = np.zeros((4, 4, 3), np.int64)
    grid[1, 1] = (2, 1, 1)
    grid[2, 2] = (3, 2, 1)
    s = triangulate_affine(grid)
    assert s.n_points == 2
    order = np.argsort(s.points3d[:, 0])
    s.points3d[order[0], :2] = (10.6, 5.0)
    s.points3d[order[1], :2] = (11.5, 5.0)
    mesh = meshing.build_mesh(s, [(20, 20)], InterpolationMode.NONE)
    path = str(tmp_path / "frac.png")
    writers.write_depth_image(path, mesh, [(20, 20)], 0, -1.0)
    img = np.asarray(Image.open(path))
    filled = img[:, :, 3] == 255
    assert img.shape[1] == 3  # ceil(11.5) - floor(10.6) + 1
    assert list(np.nonzero(filled[0])[0]) == [0, 1]


def test_map_depth_endpoints():
    c0 = map_depth(np.array(0.0))
    c1 = map_depth(np.array(1.0))
    # Reversed viridis: 0 -> yellow end, 1 -> dark purple end.
    assert c0[0] > 200 and c0[1] > 200 and c0[2] < 100
    assert c1[2] > c1[0]


def test_output_surface_dispatch(tmp_path, rng):
    s = _toy_surface()
    img = rng.randint(0, 255, (20, 20, 3), dtype=np.uint8)
    for name in ["o.ply", "o.obj", "o.png"]:
        writers.output_surface(
            s, (1.0, 1.0, -1.0), 0, [img, img], str(tmp_path / name),
            InterpolationMode.DELAUNAY, MeshMode.VERTEX_COLORS,
        )
        assert (tmp_path / name).stat().st_size > 0


def test_fused_grid_ply_byte_identical(tmp_path, rng):
    """The native fused grid-PLY lane (output_surface fast path) must be
    byte-identical to the build_mesh + write_ply chain, holes included."""
    native = pytest.importorskip("cybervision_tpu.native")
    h, w = 37, 53
    cp = np.zeros((h, w, 3), np.int64)
    ys, xs = np.mgrid[0:h, 0:w]
    cp[:, :, 0] = xs + rng.randint(0, 5, (h, w))
    cp[:, :, 1] = ys + rng.randint(-2, 3, (h, w))
    cp[:, :, 2] = (rng.uniform(size=(h, w)) > 0.3).astype(np.int64)
    s = triangulate_affine(cp)
    imgs = [rng.randint(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(2)]
    scale = (1.0, 1.0, -1.0)
    for mode in (MeshMode.VERTEX_COLORS, MeshMode.PLAIN):
        fused = tmp_path / f"fused_{mode.name}.ply"
        chain = tmp_path / f"chain_{mode.name}.ply"
        writers.output_surface(
            s, scale, 0, imgs, str(fused), InterpolationMode.DELAUNAY, mode
        )
        mesh = meshing.build_mesh(s, [(w, h), (w, h)], InterpolationMode.DELAUNAY)
        writers.write_ply(str(chain), mesh, imgs, mode, scale)
        assert fused.read_bytes() == chain.read_bytes()


def test_triangulate_affine_word_matches_planes(rng):
    """triangulate_affine_word must equal triangulate_affine on the
    unpacked planes, and its --max-points subsample must be exactly the
    old subsample-after-materialize path (same seeded choice over the
    same row-major valid list)."""
    from cybervision_tpu.ops.affine_triangulation import (
        triangulate_affine_word,
    )
    from cybervision_tpu.ops.correlation import unpack_correlated

    h, w = 37, 53
    valid = rng.rand(h, w) < 0.7
    x2 = rng.randint(0, w, (h, w)).astype(np.int32)
    y2 = rng.randint(0, h, (h, w)).astype(np.int32)
    word = (x2 & 0xFFF) | ((y2 & 0xFFF) << 12) | (valid.astype(np.int32) << 24)

    s_word = triangulate_affine_word(word)
    s_ref = triangulate_affine(unpack_correlated(word))
    np.testing.assert_array_equal(s_word.points3d, s_ref.points3d)
    np.testing.assert_array_equal(s_word.tracks, s_ref.tracks)
    assert s_word.grid_shape == s_ref.grid_shape == (h, w)

    # Subsample path: identical to choice-then-index on the full surface.
    seed, cap = 5, 200
    s_sub = triangulate_affine_word(word, max_points=cap, seed=seed)
    keep = np.random.RandomState(seed).choice(
        s_ref.n_points, cap, replace=False
    )
    np.testing.assert_array_equal(s_sub.points3d, s_ref.points3d[keep])
    np.testing.assert_array_equal(s_sub.tracks, s_ref.tracks[keep])
    assert s_sub.grid_shape is None


def test_sample_word_grid_device_subsample(rng):
    """The device-side --max-points lane must draw exactly k valid
    pixels (deterministically for a seed) whose words match the grid;
    when fewer than k valid pixels exist it must return the full
    triangulate_affine_word surface bit-for-bit (row-major, dense grid
    kept)."""
    import jax.numpy as jnp

    from cybervision_tpu.ops.affine_triangulation import (
        triangulate_affine_word,
        triangulate_affine_word_sampled,
    )
    from cybervision_tpu.ops.correlation import sample_word_grid

    h, w = 41, 57
    valid = rng.rand(h, w) < 0.6
    x2 = rng.randint(0, w, (h, w)).astype(np.int32)
    y2 = rng.randint(0, h, (h, w)).astype(np.int32)
    word = (x2 & 0xFFF) | ((y2 & 0xFFF) << 12) | (valid.astype(np.int32) << 24)
    n_valid = int(valid.sum())

    # Subsample case: k < n_valid.
    k = 300
    assert k < n_valid
    idx, words = sample_word_grid(jnp.asarray(word), k, seed=7)
    s = triangulate_affine_word_sampled(idx, words, h, w)
    assert s.n_points == k and s.grid_shape is None
    # Every drawn point is a valid grid pixel with the grid's word.
    ys, xs = np.divmod(idx.astype(np.int64), w)
    assert valid[ys, xs].all()
    np.testing.assert_array_equal(words, word[ys, xs])
    assert len(np.unique(idx)) == k  # no repeats
    # Deterministic for a seed; a different seed draws differently.
    idx2, _ = sample_word_grid(jnp.asarray(word), k, seed=7)
    np.testing.assert_array_equal(idx, idx2)
    idx3, _ = sample_word_grid(jnp.asarray(word), k, seed=8)
    assert not np.array_equal(np.sort(idx), np.sort(idx3))

    # No-subsample case: k >= n_valid -> identical to the host lane.
    idx, words = sample_word_grid(jnp.asarray(word), n_valid + 50, seed=7)
    s_all = triangulate_affine_word_sampled(idx, words, h, w)
    s_ref = triangulate_affine_word(word)
    np.testing.assert_array_equal(s_all.points3d, s_ref.points3d)
    np.testing.assert_array_equal(s_all.tracks, s_ref.tracks)
    assert s_all.grid_shape == (h, w)
