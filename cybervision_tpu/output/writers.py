"""Mesh and depth-map writers: PLY, OBJ (+MTL/textures), PNG/JPEG.

Reference (output.rs:567-1229): writer dispatch by extension; PLY as
binary big-endian doubles with optional uchar vertex colors and reversed
faces; OBJ with v/vt/f lines, per-camera usemtl and a generated .mtl plus
texture images; image output projects all points into the primary camera,
z-buffers a point splat, fills polygons by scanline interpolation,
normalizes, and applies the (reversed) viridis colormap.

Vertex serialization is numpy-vectorized (big-endian byte packing for PLY,
batched text formatting for OBJ); the C++ fast path in
cybervision_tpu.native takes over OBJ face/vertex formatting for large
meshes when built.
"""

from __future__ import annotations

import functools
import os

import numpy as np
from PIL import Image

from cybervision_tpu.config import InterpolationMode, MeshMode, OutputConfig
from cybervision_tpu.errors import OutputError
from cybervision_tpu.ops.surface import MISSING, Surface
from cybervision_tpu.output.colormap import map_depth
from cybervision_tpu.output.meshing import (
    Mesh,
    build_mesh,
    img_range,
    rasterize_polygon,
)


def _vertex_colors(surface: Surface, images: list[np.ndarray]) -> np.ndarray:
    """Per-track RGB from the first image where the track is visible
    (output.rs:712-729). Coordinates clamp to the image instead of the
    reference's skip-on-out-of-bounds (which would emit a corrupt PLY)."""
    n = surface.n_points
    colors = np.zeros((n, 3), np.uint8)
    filled = np.zeros(n, bool)
    for i, img in enumerate(images):
        vis = surface.track_visible(i) & ~filled
        if not vis.any():
            continue
        px = np.clip(surface.tracks[vis, i, 0], 0, img.shape[1] - 1)
        py = np.clip(surface.tracks[vis, i, 1], 0, img.shape[0] - 1)
        colors[vis] = img[py, px]
        filled |= vis
    return colors


def _scaled_vertices(surface: Surface, out_scale) -> np.ndarray:
    """(x*s0, -y*s1, z*s2) (output.rs:738-742)."""
    p = surface.points3d
    return np.stack(
        [p[:, 0] * out_scale[0], -p[:, 1] * out_scale[1], p[:, 2] * out_scale[2]],
        axis=1,
    )


def write_ply(path, mesh: Mesh, images, mesh_mode: MeshMode, out_scale):
    """Binary big-endian PLY (output.rs:686-772)."""
    surface = mesh.surface
    with_color = mesh_mode == MeshMode.VERTEX_COLORS
    header = [
        "ply",
        "format binary_big_endian 1.0",
        "comment Cybervision 3D surface",
        f"element vertex {surface.n_points}",
        "property double x",
        "property double y",
        "property double z",
    ]
    if with_color:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header += [
        f"element face {len(mesh.polygons)}",
        "property list uchar int vertex_indices",
        "end_header",
    ]

    try:
        from cybervision_tpu import native
    except ImportError:
        native = None

    from cybervision_tpu.utils.progress import DetailTimer

    with open(path, "wb") as fh:
        fh.write(("\n".join(header) + "\n").encode())
        with DetailTimer("ply vertex_colors"):
            colors = _vertex_colors(surface, images) if with_color else None
        if native is not None:
            # Single-pass C packing: the numpy path's byteswapped
            # record-array staging costs ~1 s at 1M vertices on the
            # bursty host vCPU.
            with DetailTimer("ply pack+write"):
                fh.write(native.ply_pack_vertices(
                    surface.points3d, out_scale, colors
                ))
                if len(mesh.polygons):
                    fh.write(native.ply_pack_faces(mesh.polygons))
        else:
            verts = _scaled_vertices(surface, out_scale).astype(">f8")
            if with_color:
                rec = np.zeros(
                    surface.n_points, dtype=[("xyz", ">f8", 3), ("rgb", "u1", 3)]
                )
                rec["xyz"] = verts
                rec["rgb"] = colors
                fh.write(rec.tobytes())
            else:
                fh.write(verts.tobytes())
            if len(mesh.polygons):
                # Faces reversed: (3, v2, v1, v0) (output.rs:757-761).
                faces = np.zeros(
                    len(mesh.polygons), dtype=[("n", "u1"), ("idx", ">i4", 3)]
                )
                faces["n"] = 3
                faces["idx"] = mesh.polygons[:, ::-1].astype(np.int32)
                fh.write(faces.tobytes())


class TextureEncoder:
    """Background PNG encode of texture images into MEMORY buffers.

    The orchestrator starts one of these as soon as the RGB images are
    decoded, so the multi-second hi-res texture encode overlaps device
    waits (the host has few vCPUs — threads only hide TPU/tunnel time,
    not each other); write_obj then just dumps the finished buffers to
    disk (a ~15 MB file write, milliseconds). Encoding to memory rather
    than to the final paths keeps failed runs from leaving stray texture
    files.

    sources[i], when set, marks image i's texture as a verbatim FILE
    COPY of that path: a PNG source with no databar crop has exactly the
    pixels the encode would produce (the texture IS the source image,
    output.rs:992), so copying the ~7 MB file replaces seconds of zlib
    work. The orchestrator only passes paths it has vetted (PNG
    extension, databar_height == 0)."""

    def __init__(
        self,
        images: list[np.ndarray],
        sources: list[str | None] | None = None,
    ):
        import io
        import threading

        self.n_images = len(images)
        self.sources = list(sources) if sources is not None else [None] * len(images)
        if len(self.sources) != len(images):
            self.sources = [None] * len(images)
        self.buffers = [io.BytesIO() for _ in images]
        self.threads = []
        for img, buf, src in zip(images, self.buffers, self.sources):
            if src is not None:
                self.threads.append(None)
                continue
            t = threading.Thread(
                target=self._encode, args=(img, buf), daemon=True
            )
            t.start()
            self.threads.append(t)

    @staticmethod
    def _encode(img: np.ndarray, buf) -> None:
        Image.fromarray(img).save(buf, format="PNG", compress_level=1)

    def write_to(self, dirname: str, stem: str) -> None:
        import shutil

        for i, (t, buf, src) in enumerate(
            zip(self.threads, self.buffers, self.sources)
        ):
            dst = os.path.join(dirname, f"{stem}-{i}.png")
            if src is not None:
                if os.path.abspath(src) != os.path.abspath(dst):
                    shutil.copyfile(src, dst)
                continue
            t.join()
            with open(dst, "wb") as fh:
                fh.write(buf.getbuffer())


def write_obj(path, mesh: Mesh, images, mesh_mode: MeshMode, out_scale,
              texture_encoder: TextureEncoder | None = None):
    """Wavefront OBJ (+ .mtl and texture images for texture mode)
    (output.rs:774-1007)."""
    surface = mesh.surface
    stem = os.path.splitext(os.path.basename(path))[0]
    dirname = os.path.dirname(path) or "."
    textured = mesh_mode == MeshMode.TEXTURE_COORDINATES

    # Texture PNG encode runs on threads concurrent with the OBJ body
    # write (PIL's encoder releases the GIL); compress_level=1 because
    # the 12-Mpix hi-res textures take seconds at zlib's default 6 and
    # the reference makes no compression-level promise (output.rs:992).
    # A pre-started TextureEncoder (already encoding since image load)
    # replaces the threads entirely.
    if texture_encoder is not None and texture_encoder.n_images != len(images):
        texture_encoder = None  # image set changed: encode fresh
    encoders = []
    if textured and texture_encoder is None:
        import threading

        def _save_texture(img, name):
            Image.fromarray(img).save(
                os.path.join(dirname, name), compress_level=1
            )

        for i, img in enumerate(images):
            t = threading.Thread(
                target=_save_texture, args=(img, f"{stem}-{i}.png")
            )
            t.start()
            encoders.append(t)

    try:
        from cybervision_tpu.native import format_obj_vertices as native_fmt
    except Exception:
        native_fmt = None

    with open(path, "w") as fh:
        if textured:
            fh.write(f"mtllib {stem}.mtl\n")
        verts = _scaled_vertices(surface, out_scale)
        if mesh_mode == MeshMode.VERTEX_COLORS:
            colors = _vertex_colors(surface, images).astype(np.float64) / 255.0
            if native_fmt is not None:
                fh.write(native_fmt(verts, colors))
            else:
                rows = np.concatenate([verts, colors], axis=1)
                fh.writelines(
                    f"v {r[0]} {r[1]} {r[2]} {r[3]} {r[4]} {r[5]}\n"
                    for r in rows
                )
        else:
            if native_fmt is not None:
                fh.write(native_fmt(verts))
            else:
                fh.writelines(f"v {r[0]} {r[1]} {r[2]}\n" for r in verts)

        # Texture coordinates: one vt per visible projection, tracked by a
        # per-track offset index (output.rs:938-969).
        uv_index = None
        if textured:
            vis = surface.tracks[:, :, 0] != MISSING  # (N, n_images)
            counts = vis.sum(axis=1)
            uv_index = np.concatenate([[0], np.cumsum(counts)])
            # One pass over VISIBLE projections only (np.nonzero's
            # row-major order matches the reference's track-then-image
            # nested loop) instead of an O(N * n_images) Python loop.
            t_idx, i_idx = np.nonzero(vis)
            wh = np.array(
                [[img.shape[1], img.shape[0]] for img in images],
                np.float64,
            ).reshape(-1, 2)
            u = surface.tracks[t_idx, i_idx, 0] / wh[i_idx, 0]
            v = 1.0 - surface.tracks[t_idx, i_idx, 1] / wh[i_idx, 1]
            try:
                from cybervision_tpu.native import format_obj_uvs

                fh.write(format_obj_uvs(np.stack([u, v], axis=1)))
            except ImportError:
                fh.writelines(
                    f"vt {a} {b}\n" for a, b in zip(u.tolist(), v.tolist())
                )

        vis = surface.tracks[:, :, 0] != MISSING
        if textured and len(mesh.polygons):
            # Vectorized: per face, the 1-based vertex index and its
            # per-projection UV index (offset of the visible projections
            # before `cam` in this track's vt block, output.rs:950-969) —
            # the per-polygon Python loop dominated the hi-res save phase.
            vis_cum = np.cumsum(vis, axis=1)  # projections up to/incl. i
            rev = np.asarray(mesh.polygons)[:, ::-1]
            cams = np.asarray(mesh.polygon_cameras)
            c = cams[:, None]
            uvs = (
                uv_index[rev] + vis_cum[rev, c] - vis[rev, c] + 1
            ).astype(np.int64)
            try:
                from cybervision_tpu.native import format_obj_faces_uv
            except ImportError:
                format_obj_faces_uv = None
            # usemtl breaks at camera-run boundaries (the mesh builder
            # emits polygons grouped by camera).
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(cams)) + 1, [len(cams)]]
            )
            for s, e in zip(starts[:-1], starts[1:]):
                fh.write(f"usemtl Textured{cams[s]}\n")
                if format_obj_faces_uv is not None:
                    fh.write(format_obj_faces_uv(rev[s:e] + 1, uvs[s:e]))
                else:
                    fh.writelines(
                        f"f {f0}/{u0} {f1}/{u1} {f2}/{u2}\n"
                        for (f0, f1, f2), (u0, u1, u2) in zip(
                            (rev[s:e] + 1).tolist(), uvs[s:e].tolist()
                        )
                    )
        elif len(mesh.polygons):
            rev = np.asarray(mesh.polygons)[:, ::-1] + 1
            try:
                from cybervision_tpu.native import format_obj_faces

                fh.write(format_obj_faces(rev))
            except ImportError:
                fh.writelines(
                    f"f {r[0]} {r[1]} {r[2]}\n" for r in rev
                )

    if textured:
        with open(os.path.join(dirname, f"{stem}.mtl"), "w") as fh:
            for i in range(len(images)):
                name = f"{stem}-{i}.png"
                fh.write(
                    f"newmtl Textured{i}\nKa 0.2 0.2 0.2\nKd 0.8 0.8 0.8\n"
                    f"Ks 1.0 1.0 1.0\nillum 2\nNs 0.000500\n"
                    f"map_Ka {name}\nmap_Kd {name}\n\n"
                )
        if texture_encoder is not None:
            texture_encoder.write_to(dirname, stem)
        for t in encoders:
            t.join()


def write_depth_image(
    path, mesh: Mesh, image_dimensions, project_to_image: int, z_sign: float,
    output_cfg: OutputConfig = OutputConfig(),
):
    """Depth-map image writer (output.rs:1009-1144): project every point
    into the primary camera, z-buffer splat keeping the larger depth,
    polygon-interpolated fill, normalize, reversed-viridis colormap."""
    surface = mesh.surface
    proj = surface.project_points(project_to_image)
    depth = surface.point_depths(project_to_image) * z_sign
    (rx0, rx1), (ry0, ry1) = img_range(
        image_dimensions[project_to_image], output_cfg.max_center_distance
    )
    ok = (proj[:, 0] > rx0) & (proj[:, 0] < rx1) & (proj[:, 1] > ry0) & (proj[:, 1] < ry1)
    if not ok.any():
        raise OutputError("No point projections found")
    # Offsets subtract the RAW minimum while the canvas spans
    # floor(min)..ceil(max) (output.rs:1048-1060) — flooring the offset
    # origin too would shift every splat/fill cell by frac(min).
    min_x = proj[ok, 0].min()
    max_x = proj[ok, 0].max()
    min_y = proj[ok, 1].min()
    max_y = proj[ok, 1].max()
    width = int(np.ceil(max_x) - np.floor(min_x)) + 1
    height = int(np.ceil(max_y) - np.floor(min_y)) + 1

    out = np.full((height, width), -np.inf)
    px = proj[:, 0] - min_x
    py = proj[:, 1] - min_y
    # f64::round = half away from zero (offsets are >= 0 here), not
    # numpy's banker's rounding.
    ix = np.clip(np.floor(px[ok] + 0.5).astype(np.int64), 0, width - 1)
    iy = np.clip(np.floor(py[ok] + 0.5).astype(np.int64), 0, height - 1)
    # The reference keeps the larger depth on splat collisions
    # (output.rs:1061-1069).
    np.maximum.at(out, (iy, ix), depth[ok])

    # Polygon fill (output.rs:1088-1115); C++ fast path when built.
    if len(mesh.polygons):
        try:
            from cybervision_tpu.native import rasterize_polygons_max

            pts_all = np.stack([px, py, depth], axis=1)
            rasterize_polygons_max(out, pts_all, ok, mesh.polygons)
        except ImportError:
            for poly in mesh.polygons:
                if not ok[poly].all():
                    continue
                pts = np.stack(
                    [[px[v], py[v], depth[v]] for v in poly],
                    axis=0,
                )
                xs, ys, vals = rasterize_polygon(pts, width - 1, height - 1)
                if len(xs) == 0:
                    continue
                np.maximum.at(out, (ys, xs), vals)

    filled = np.isfinite(out)
    lo = out[filled].min()
    hi = out[filled].max()
    norm = (out - lo) / max(hi - lo, np.finfo(np.float64).eps)
    rgb = map_depth(np.clip(norm, 0.0, 1.0))
    rgba = np.zeros((height, width, 4), np.uint8)
    rgba[:, :, :3] = rgb
    rgba[:, :, 3] = np.where(filled, 255, 0)
    img = Image.fromarray(rgba, "RGBA")
    if path.lower().endswith((".jpg", ".jpeg")):
        img = img.convert("RGB")
    img.save(path)


@functools.lru_cache(maxsize=1)
def _affine_depth_rgba_jit():
    """The jitted program is created once (a fresh jax.jit wrapper per
    call would re-trace + re-look-up the compile cache every time,
    ~200 ms of host work per image on the TPU tunnel)."""
    import jax

    def go(arr, z_sign):
        import jax.numpy as jnp

        from cybervision_tpu.output.colormap import _viridis_lut

        valid = arr[:, :, 2] == 1
        h, w = valid.shape
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        dx = xs - arr[:, :, 0].astype(jnp.float32)
        dy = ys - arr[:, :, 1].astype(jnp.float32)
        depth = jnp.hypot(dx, dy) * z_sign

        big = jnp.float32(3.0e38)
        lo = jnp.min(jnp.where(valid, depth, big))
        hi = jnp.max(jnp.where(valid, depth, -big))
        norm = jnp.clip((depth - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0)

        lut = jnp.asarray(_viridis_lut(), jnp.float32)
        v = jnp.clip(norm * 255.0, 0.0, 255.0)
        box = jnp.minimum(v.astype(jnp.int32), 254)
        ratio = (v - box)[:, :, None]
        rgb = lut[box] * (1.0 - ratio) + lut[box + 1] * ratio
        return jnp.concatenate(
            [
                (rgb + 0.5).astype(jnp.uint8),
                jnp.where(valid, 255, 0).astype(jnp.uint8)[:, :, None],
            ],
            axis=2,
        )

    return jax.jit(go)


def _affine_depth_rgba(arr, z_sign):
    return _affine_depth_rgba_jit()(arr, z_sign)


def write_depth_image_affine_device(path: str, correlated: "jnp-or-np array",
                                    z_sign: float):
    """Device fast lane for the parallel-projection depth map with
    interpolation=none.

    For affine surfaces every valid img1 pixel contributes exactly one
    point whose projection is the pixel itself (triangulation.rs:313-330 +
    output.rs:1052-1072), so the reference's z-buffered splat reduces to an
    elementwise map: depth = z_sign * hypot(dx, dy), normalized and
    colormapped on device. Verified equal to the generic writer in tests.
    """
    import jax.numpy as jnp

    # One jitted program (eager ops each pay tunnel dispatch latency);
    # accepts the packed state still resident on device — no host round
    # trip of the (H, W, 3) grid.
    out = np.asarray(_affine_depth_rgba(jnp.asarray(correlated),
                                        jnp.float32(z_sign)))
    vnp = out[:, :, 3] == 255
    if not vnp.any():
        raise OutputError("No point projections found")
    ys_i, xs_i = np.nonzero(vnp)
    out = out[ys_i.min() : ys_i.max() + 1, xs_i.min() : xs_i.max() + 1]
    img = Image.fromarray(out, "RGBA")
    if path.lower().endswith((".jpg", ".jpeg")):
        img = img.convert("RGB")
    img.save(path)


def output_surface(
    surface: Surface,
    out_scale,
    project_to_image: int,
    images: list[np.ndarray],
    path: str,
    interpolation: InterpolationMode,
    mesh_mode: MeshMode,
    progress=None,
    output_cfg: OutputConfig = OutputConfig(),
    texture_encoder: TextureEncoder | None = None,
):
    """Writer facade (output.rs:567-611): dispatch on extension, build the
    mesh, emit."""
    from cybervision_tpu.utils.progress import DetailTimer

    image_dimensions = [(img.shape[1], img.shape[0]) for img in images]

    # Fused native fast lane for the grid-mesh PLY config (the north-star
    # benchmark): one streaming C pass derives the faces from the pixel
    # grid and writes header + body directly, skipping the triangle-array
    # and staging-buffer round trips on the bandwidth-bound host.
    if (
        path.lower().endswith(".ply")
        and interpolation == InterpolationMode.DELAUNAY
        and output_cfg.grid_mesh
        and surface.grid_shape is not None
        and surface.n_points > 0
        # The native color sampler indexes images[0] with grid
        # coordinates; fall back if the dimensions ever diverge.
        and (
            mesh_mode != MeshMode.VERTEX_COLORS
            or images[0].shape[:2] == tuple(surface.grid_shape)
        )
    ):
        try:
            from cybervision_tpu import native
        except ImportError:
            native = None
        if native is not None:
            with DetailTimer("ply fused grid write"):
                native.ply_write_grid(
                    path, surface.points3d, out_scale, surface.tracks,
                    surface.grid_shape,
                    images[0]
                    if mesh_mode == MeshMode.VERTEX_COLORS
                    else None,
                )
            if progress is not None:
                progress.report_status(1.0)
            return

    with DetailTimer("build_mesh"):
        mesh = build_mesh(
            surface, image_dimensions, interpolation, progress, output_cfg
        )
    lower = path.lower()
    with DetailTimer(f"write {lower.rsplit('.', 1)[-1]}"):
        if lower.endswith(".obj"):
            write_obj(path, mesh, images, mesh_mode, out_scale,
                      texture_encoder=texture_encoder)
        elif lower.endswith(".ply"):
            write_ply(path, mesh, images, mesh_mode, out_scale)
        else:
            write_depth_image(
                path, mesh, image_dimensions, project_to_image,
                float(np.sign(out_scale[2])), output_cfg,
            )
    if progress is not None:
        progress.report_status(1.0)
