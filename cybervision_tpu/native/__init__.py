"""ctypes bindings for the native host-runtime kernels (native.cpp).

The shared library builds lazily via make on first import; import fails
cleanly (ImportError) when no toolchain is available, and every caller
falls back to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcvtpu_native.so")


def _build() -> None:
    src = os.path.join(_DIR, "native.cpp")
    mk = os.path.join(_DIR, "Makefile")
    if os.path.exists(_SO):
        # Makefile counts as a source: flag/define edits must rebuild
        # too. A deployment stripped down to just the prebuilt .so
        # (sources absent) keeps working — nothing to compare against.
        mtimes = [os.path.getmtime(p) for p in (src, mk) if os.path.exists(p)]
        if not mtimes or os.path.getmtime(_SO) >= max(mtimes):
            return
    subprocess.run(
        ["make", "-s", "libcvtpu_native.so"],
        cwd=_DIR,
        check=True,
        capture_output=True,
    )


try:
    _build()
    _lib = ctypes.CDLL(_SO)
except Exception as err:  # pragma: no cover - toolchain-dependent
    raise ImportError(f"native module unavailable: {err}") from err

_lib.polygons_obstruct.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
    ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
    ctypes.POINTER(ctypes.c_uint8),
]
_lib.rasterize_polygons_max.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
    ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
]
_lib.grid_mesh_triangles.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
    ctypes.POINTER(ctypes.c_int32),
]
_lib.grid_mesh_triangles.restype = ctypes.c_long
_lib.ply_pack_vertices.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.c_long,
    ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_char_p,
]
_lib.ply_pack_vertices.restype = ctypes.c_long
_lib.ply_pack_faces.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_char_p,
]
_lib.ply_pack_faces.restype = ctypes.c_long
_lib.ply_write_grid.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_double), ctypes.c_long,
    ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
]
_lib.ply_write_grid.restype = ctypes.c_long
_lib.ply_write_corr_grid.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
    ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.POINTER(ctypes.c_int32),
]
_lib.ply_write_corr_grid.restype = ctypes.c_long
_lib.ply_write_delta_grid.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_uint16), ctypes.c_long, ctypes.c_long,
    ctypes.POINTER(ctypes.c_double),
    ctypes.POINTER(ctypes.c_uint8),
    ctypes.POINTER(ctypes.c_int32),
]
_lib.ply_write_delta_grid.restype = ctypes.c_long
_lib.format_obj_vertices.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.c_long,
    ctypes.POINTER(ctypes.c_double), ctypes.c_char_p,
]
_lib.format_obj_vertices.restype = ctypes.c_long
_lib.format_obj_faces.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_char_p,
]
_lib.format_obj_faces.restype = ctypes.c_long
_lib.format_obj_uvs.argtypes = [
    ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_char_p,
]
_lib.format_obj_uvs.restype = ctypes.c_long
_lib.format_obj_faces_uv.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ctypes.c_long, ctypes.c_char_p,
]
_lib.format_obj_faces_uv.restype = ctypes.c_long
_lib.delaunay_int.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
    ctypes.POINTER(ctypes.c_int32),
]
_lib.delaunay_int.restype = ctypes.c_long


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def polygons_obstruct(buf, proj, depth, polys) -> np.ndarray:
    """(M,) bool: polygon hides a nearer z-buffer point (output.rs:320-354)."""
    buf = np.ascontiguousarray(buf, np.float64)
    proj = np.ascontiguousarray(proj, np.float64)
    depth = np.ascontiguousarray(depth, np.float64)
    polys = np.ascontiguousarray(polys, np.int32)
    out = np.zeros(len(polys), np.uint8)
    _lib.polygons_obstruct(
        _dptr(buf), buf.shape[0], buf.shape[1], _dptr(proj), _dptr(depth),
        polys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(polys),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def rasterize_polygons_max(out, pts, valid, polys) -> None:
    """In-place max-combine polygon fill (output.rs:1088-1115).
    out: (H, W) f64; pts: (N, 3) (x, y, value); valid: (N,) bool."""
    assert out.dtype == np.float64 and out.flags.c_contiguous
    pts = np.ascontiguousarray(pts, np.float64)
    valid_u8 = np.ascontiguousarray(valid, np.uint8)
    polys = np.ascontiguousarray(polys, np.int32)
    _lib.rasterize_polygons_max(
        _dptr(out), out.shape[0], out.shape[1], _dptr(pts),
        valid_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        polys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(polys),
    )


def grid_mesh_triangles(idx: np.ndarray) -> np.ndarray:
    """Triangulate the valid 2x2 quads of a (h, w) int32 pixel-index grid
    (-1 = empty); canonical vertex rotation applied (output.rs:55-67)."""
    idx = np.ascontiguousarray(idx, np.int32)
    h, w = idx.shape
    out = np.empty((2 * max(h - 1, 0) * max(w - 1, 0), 3), np.int32)
    n = _lib.grid_mesh_triangles(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[:n]


def ply_pack_vertices(points3d, out_scale, colors=None) -> bytes:
    """BE-binary PLY vertex records: (x*s0, -y*s1, z*s2) doubles
    (+ u8 RGB) per point (output.rs:738-742)."""
    pts = np.ascontiguousarray(points3d, np.float64)
    scale = np.ascontiguousarray(out_scale, np.float64)
    n = len(pts)
    per = 27 if colors is not None else 24
    buf = ctypes.create_string_buffer(per * max(n, 1))
    cptr = (
        np.ascontiguousarray(colors, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        )
        if colors is not None
        else ctypes.POINTER(ctypes.c_uint8)()
    )
    written = _lib.ply_pack_vertices(_dptr(pts), n, _dptr(scale), cptr, buf)
    return buf.raw[:written]


def ply_pack_faces(faces) -> bytes:
    """BE-binary PLY face records: u8 3 + reversed BE i32 indices
    (output.rs:757-761). Pass UNreversed (v0, v1, v2) triangles."""
    faces = np.ascontiguousarray(faces, np.int32)
    buf = ctypes.create_string_buffer(13 * max(len(faces), 1))
    written = _lib.ply_pack_faces(
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces), buf
    )
    return buf.raw[:written]


def ply_write_grid(path, points3d, out_scale, tracks, grid_shape, image=None) -> int:
    """Fused grid-mesh PLY writer: scatters the camera-0 track positions
    into a pixel-index grid, then streams header + vertices (+colors
    sampled from `image`) + grid-derived faces to `path` in one native
    call — byte-identical to the grid_mesh_triangles + ply_pack_* chain.
    image=None writes a plain (colorless) mesh. Returns the face count;
    raises OutputError on write failure."""
    pts = np.ascontiguousarray(points3d, np.float64)
    scale = np.ascontiguousarray(out_scale, np.float64)
    tracks = np.ascontiguousarray(tracks, np.int32)
    h, w = grid_shape
    iptr = (
        np.ascontiguousarray(image, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        )
        if image is not None
        else ctypes.POINTER(ctypes.c_uint8)()
    )
    idx = np.empty((h, w), np.int32)
    faces = _lib.ply_write_grid(
        path.encode(), _dptr(pts), len(pts), _dptr(scale),
        tracks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tracks.shape[1], iptr,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
    )
    if faces < 0:
        from cybervision_tpu.errors import OutputError

        raise OutputError(f"ply_write_grid: cannot write {path}")
    return int(faces)


def ply_write_corr_grid(path, word, out_scale, image=None) -> int:
    """Fully fused affine PLY lane: word is the (H, W) int32 compact
    correlation grid (x2 | y2<<12 | valid<<24); vertices are the valid
    pixels in row-major order with z = hypot(x - x2, y - y2) computed
    natively — byte-identical to the triangulate_affine + ply_write_grid
    chain without its host numpy passes. Returns the face count; raises
    OutputError on write failure."""
    word = np.ascontiguousarray(word, np.int32)
    h, w = word.shape
    scale = np.ascontiguousarray(out_scale, np.float64)
    iptr = (
        np.ascontiguousarray(image, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        )
        if image is not None
        else ctypes.POINTER(ctypes.c_uint8)()
    )
    idx = np.empty((h, w), np.int32)
    faces = _lib.ply_write_corr_grid(
        path.encode(),
        word.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
        _dptr(scale), iptr,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if faces < 0:
        from cybervision_tpu.errors import OutputError

        raise OutputError(f"ply_write_corr_grid: cannot write {path}")
    return int(faces)


def ply_write_delta_grid(path, d16, out_scale, image=None) -> int:
    """ply_write_corr_grid on the 2-byte delta-compressed fetch payload
    (ops.correlation._pack_state_delta) — byte-identical PLY, half the
    tunnel bytes. The caller must already have checked the overflow flag
    (bit 15 of any element) and fallen back to the word plane if set.
    Returns the face count; raises OutputError on write failure."""
    d16 = np.ascontiguousarray(d16, np.uint16)
    h, w = d16.shape
    scale = np.ascontiguousarray(out_scale, np.float64)
    iptr = (
        np.ascontiguousarray(image, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        )
        if image is not None
        else ctypes.POINTER(ctypes.c_uint8)()
    )
    idx = np.empty((h, w), np.int32)
    faces = _lib.ply_write_delta_grid(
        path.encode(),
        d16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), h, w,
        _dptr(scale), iptr,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if faces < 0:
        from cybervision_tpu.errors import OutputError

        raise OutputError(f"ply_write_delta_grid: cannot write {path}")
    return int(faces)


def format_obj_vertices(verts, colors=None) -> str:
    """'v x y z[ r g b]\\n' lines, shortest-round-trip doubles."""
    verts = np.ascontiguousarray(verts, np.float64)
    n = len(verts)
    # Worst-case shortest-round-trip double is ~24 chars ("-1.7976...e-308"
    # class); a colored line is 'v ' + 6 fields + separators + newline,
    # so 176/line bounds it (120 was measurably too small: typical scaled
    # colored lines run ~150 bytes — a heap overflow, not a truncation).
    per = 176 if colors is not None else 96
    buf = ctypes.create_string_buffer(per * max(n, 1))
    cptr = (
        _dptr(np.ascontiguousarray(colors, np.float64))
        if colors is not None
        else ctypes.POINTER(ctypes.c_double)()
    )
    written = _lib.format_obj_vertices(_dptr(verts), n, cptr, buf)
    return buf.raw[:written].decode()


def format_obj_faces(faces) -> str:
    """'f a b c\\n' lines (pass 1-based, reversed indices)."""
    faces = np.ascontiguousarray(faces, np.int32)
    buf = ctypes.create_string_buffer(64 * max(len(faces), 1))
    written = _lib.format_obj_faces(
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces), buf
    )
    return buf.raw[:written].decode()


def format_obj_uvs(uvs) -> str:
    """'vt u v\\n' lines from (N, 2) doubles, shortest-round-trip
    (round-trip-exact vs the f-string fallback; integer-valued doubles
    render '1' where Python writes '1.0')."""
    uvs = np.ascontiguousarray(uvs, np.float64)
    # 'vt ' + two <=24-char doubles + separator + newline => 64 bounds it.
    buf = ctypes.create_string_buffer(64 * max(len(uvs), 1))
    written = _lib.format_obj_uvs(_dptr(uvs), len(uvs), buf)
    return buf.raw[:written].decode()


def format_obj_faces_uv(faces, uvs) -> str:
    """'f a/ua b/ub c/uc\\n' lines (pass 1-based, reversed vertex and UV
    index triples of equal shape)."""
    faces = np.ascontiguousarray(faces, np.int32)
    uvs = np.ascontiguousarray(uvs, np.int32)
    assert faces.shape == uvs.shape
    buf = ctypes.create_string_buffer(96 * max(len(faces), 1))
    written = _lib.format_obj_faces_uv(
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        uvs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(faces), buf
    )
    return buf.raw[:written].decode()


def delaunay_int(pts: np.ndarray) -> np.ndarray | None:
    """Exact-integer 2D Delaunay triangulation (Bowyer–Watson, int128
    in-circle). pts: (N, 2) integer coords, |coords| < 2^25, pairwise
    distinct. Returns (M, 3) int32 CCW triangles, or None when the input
    is out of contract (caller falls back to Qhull). ~5x faster than
    Qhull on the affine --max-points pixel clouds."""
    pts = np.ascontiguousarray(pts, np.int32)
    n = len(pts)
    if n < 3:
        return None
    out = np.empty((2 * (n + 1), 3), np.int32)
    m = _lib.delaunay_int(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if m < 0:
        return None
    return out[:m]


def merge_tracks_image(
    pts: np.ndarray, image_i: int, w: int, h: int, r: int, max_d2: int
) -> np.ndarray:
    """Per-image track merge (triangulation.rs:1421-1539); the exact
    native form of ops.sfm.merge_tracks's numpy math (that docstring is
    the spec). pts: (T, n_images, 2) int32 with -1 missing. Returns the
    merged (K, n_images, 2) int32 tracks in row-major pixel order."""
    pts = np.ascontiguousarray(pts, np.int32)
    t_count, n_img = pts.shape[0], pts.shape[1]
    out = np.empty((h * w, n_img, 2), np.int32)
    k = _lib.merge_tracks_image(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_count, n_img, image_i, w, h, r, max_d2,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[:k].copy()


_lib.merge_tracks_image.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
    ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
    ctypes.c_long, ctypes.POINTER(ctypes.c_int32),
]
_lib.merge_tracks_image.restype = ctypes.c_long


# Importing succeeded: the toolchain built (or reused) the shared library.
AVAILABLE = True
