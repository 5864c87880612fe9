"""Image loading, SEM/EXIF metadata, resizing, and camera intrinsics.

Mirrors the reference's SourceImage (reconstruction.rs:23-186):
  * grayscale (luma8) and RGB loads with databar cropping
  * FEI/Phenom (TIFF tag 34683) and FEI Quanta (34682) SEM metadata:
    [Scan] PixelWidth/PixelHeight scale, [Stage] StageT tilt,
    [PrivateFei] DatabarHeight (reconstruction.rs:80-144)
  * EXIF FocalLengthIn35mmFilm (reconstruction.rs:138-142)
  * Lanczos3 pyramid resize (reconstruction.rs:146-162)
  * intrinsics K from the 35mm-equivalent focal length via the diagonal
    ratio (reconstruction.rs:164-185)
"""

from __future__ import annotations

import dataclasses

import numpy as np
from PIL import Image

# FEI SEM TIFF private tags (reconstruction.rs:20-21).
TIFFTAG_META_PHENOM = 34683
TIFFTAG_META_QUANTA = 34682
# Standard EXIF tag FocalLengthIn35mmFilm.
EXIF_FOCAL_LENGTH_35MM = 41989


@dataclasses.dataclass
class ImageMeta:
    scale: tuple[float, float] = (1.0, 1.0)
    tilt_angle: float | None = None
    databar_height: int = 0
    focal_length_35mm: int | None = None


def _parse_sem_metadata(data: str, meta: ImageMeta) -> None:
    """Parse the INI-style FEI metadata block (reconstruction.rs:107-136)."""

    def tag_value(line: str, cast):
        _, _, value = line.partition("=")
        try:
            return cast(value)
        except ValueError:
            return None

    section = ""
    scale_width: float | None = None
    scale_height: float | None = None
    for line in data.replace("\r", "\n").split("\n"):
        if not line:
            continue
        if line.startswith("[") and line.endswith("]"):
            section = line
            continue
        if section == "[Scan]":
            if line.startswith("PixelWidth"):
                scale_width = scale_width if scale_width is not None else tag_value(line, float)
            elif line.startswith("PixelHeight"):
                scale_height = scale_height if scale_height is not None else tag_value(line, float)
        elif section == "[Stage]":
            if line.startswith("StageT="):
                meta.tilt_angle = tag_value(line, float)
        elif section == "[PrivateFei]" and line.startswith("DatabarHeight="):
            value = tag_value(line, int)
            if value is not None:
                meta.databar_height = value
    meta.scale = (
        scale_width if scale_width is not None else 1.0,
        scale_height if scale_height is not None else 1.0,
    )


def _meta_from_open(img: Image.Image) -> ImageMeta:
    """Extract SEM + EXIF metadata from an already-open PIL image;
    silently defaults on failure (reconstruction.rs:62-73).

    NOTE: PIL's getexif() forces a full pixel decode for PNGs (the eXIf
    chunk can trail the image data), so callers that will also read the
    pixels should run this on the SAME open handle — the decode is then
    reused by the later convert() instead of happening twice."""
    meta = ImageMeta()
    try:
        sem_data = None
        tags = getattr(img, "tag_v2", None)
        if tags is not None:
            raw = tags.get(TIFFTAG_META_PHENOM) or tags.get(TIFFTAG_META_QUANTA)
            if raw is not None:
                if isinstance(raw, bytes):
                    sem_data = raw.decode("utf-8", errors="ignore")
                else:
                    sem_data = str(raw)
        if sem_data:
            _parse_sem_metadata(sem_data, meta)
        # Guard the EXIF step separately: a corrupt EXIF payload must
        # not discard SEM metadata already parsed above (the databar
        # crop in particular — losing it would feed overlay text
        # pixels into the reconstruction).
        try:
            exif = img.getexif()
            focal = exif.get(EXIF_FOCAL_LENGTH_35MM)
            if focal is None:
                # Sub-IFD EXIF block (JPEGs store it there).
                focal = exif.get_ifd(0x8769).get(EXIF_FOCAL_LENGTH_35MM)
            if focal is not None:
                meta.focal_length_35mm = int(focal)
        except Exception:
            pass
    except Exception:
        return meta
    return meta


# Metadata is read twice per image (grayscale + RGB load); the stat-keyed
# cache makes the second read free. Entries are immutable by convention
# (no caller mutates the returned ImageMeta).
_META_CACHE: dict[str, tuple[tuple[int, int], ImageMeta]] = {}


def _stat_sig(path: str) -> tuple[int, int] | None:
    import os

    try:
        st = os.stat(path)
    except OSError:
        return None
    return (st.st_mtime_ns, st.st_size)


def _cached_meta(path: str, img: Image.Image) -> ImageMeta:
    sig = _stat_sig(path)
    if sig is not None:
        hit = _META_CACHE.get(path)
        if hit is not None and hit[0] == sig:
            return hit[1]
    meta = _meta_from_open(img)
    if sig is not None:
        _META_CACHE[path] = (sig, meta)
    return meta


def read_metadata(path: str) -> ImageMeta:
    """Extract SEM + EXIF metadata; silently defaults on failure
    (reconstruction.rs:62-73)."""
    try:
        with Image.open(path) as img:
            return _cached_meta(path, img)
    except Exception:
        return ImageMeta()


class SourceImage:
    """A grayscale source image plus its SEM/EXIF metadata."""

    def __init__(
        self,
        img: np.ndarray,
        scale: tuple[float, float] = (1.0, 1.0),
        focal_length_35mm: int | None = None,
        tilt_angle: float | None = None,
        filename: str = "",
    ):
        assert img.dtype == np.uint8 and img.ndim == 2
        self.img = img
        self.scale = scale
        self.focal_length_35mm = focal_length_35mm
        self.tilt_angle = tilt_angle
        self.filename = filename

    @property
    def shape(self) -> tuple[int, int]:
        """(height, width)."""
        return self.img.shape

    @property
    def dimensions(self) -> tuple[int, int]:
        """(width, height) — matches the reference's GrayImage::dimensions."""
        return (self.img.shape[1], self.img.shape[0])

    @classmethod
    def load(cls, path: str) -> "SourceImage":
        """Load as luma8 and crop the SEM databar (reconstruction.rs:40-52).

        One open serves both the metadata read and the pixel decode: PNG
        getexif() forces a decode, which convert() then reuses — a second
        Image.open would decode the 12-Mpix hi-res inputs twice."""
        with Image.open(path) as pil:
            meta = _cached_meta(path, pil)
            img = np.asarray(pil.convert("L"), dtype=np.uint8)
        if meta.databar_height > 0:
            img = img[: img.shape[0] - meta.databar_height, :]
        return cls(
            np.ascontiguousarray(img),
            scale=meta.scale,
            focal_length_35mm=meta.focal_length_35mm,
            tilt_angle=meta.tilt_angle,
            filename=path,
        )

    @staticmethod
    def load_rgb(path: str) -> np.ndarray:
        """RGB load with databar cropping (reconstruction.rs:54-60)."""
        with Image.open(path) as pil:
            meta = _cached_meta(path, pil)
            img = np.asarray(pil.convert("RGB"), dtype=np.uint8)
        if meta.databar_height > 0:
            img = img[: img.shape[0] - meta.databar_height, :]
        return np.ascontiguousarray(img)

    def resize(self, scale: float) -> np.ndarray:
        """Lanczos3 resize to (w*scale, h*scale), truncated like the
        reference's `as u32` casts (reconstruction.rs:146-162)."""
        return resize_lanczos(self.img, scale)

    def calibration_matrix(self, focal_length_35mm: int | None = None) -> np.ndarray:
        """Intrinsics from the 35mm-equivalent focal length: f_img/f_35mm ==
        diagonal/diagonal(24x36mm) (reconstruction.rs:164-185)."""
        diagonal_35mm = math_hypot(24.0, 36.0)
        height, width = self.img.shape
        diagonal = math_hypot(float(width), float(height))
        focal = focal_length_35mm
        if focal is None:
            focal = self.focal_length_35mm
        if focal is None:
            focal = 1
        focal_length = float(focal) * diagonal / diagonal_35mm
        return np.array(
            [
                [focal_length, 0.0, width / 2.0],
                [0.0, focal_length, height / 2.0],
                [0.0, 0.0, 1.0],
            ],
            dtype=np.float64,
        )


def math_hypot(a: float, b: float) -> float:
    return float(np.hypot(a, b))


def resize_lanczos(img: np.ndarray, scale: float) -> np.ndarray:
    """Lanczos3 resize of a u8 image by a uniform scale factor."""
    if scale == 1.0:
        return img
    h, w = img.shape[:2]
    new_w, new_h = int(w * scale), int(h * scale)
    pil = Image.fromarray(img)
    out = pil.resize((new_w, new_h), Image.Resampling.LANCZOS)
    return np.asarray(out, dtype=np.uint8)
