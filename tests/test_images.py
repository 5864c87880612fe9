"""Image loading / SEM metadata / intrinsics tests.

Oracle behavior from reference reconstruction.rs:23-186.
"""

import numpy as np
import pytest
from PIL import Image, TiffImagePlugin

from cybervision_tpu.config import optimal_scale_steps, pyramid_scales
from cybervision_tpu.images import (
    TIFFTAG_META_PHENOM,
    SourceImage,
    read_metadata,
    resize_lanczos,
)

SEM_METADATA = (
    "[User]\r\nDate=01/01/2020\r\n"
    "[Scan]\r\nPixelWidth=9.7656e-008\r\nPixelHeight=9.7656e-008\r\n"
    "[Stage]\r\nStageT=0.1745329\r\n"
    "[PrivateFei]\r\nDatabarHeight=60\r\n"
)


def _write_sem_tiff(path, img):
    pil = Image.fromarray(img)
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[TIFFTAG_META_PHENOM] = SEM_METADATA
    pil.save(path, tiffinfo=info)


def test_sem_tiff_metadata(tmp_path, rng):
    img = rng.randint(0, 256, (512, 512), dtype=np.uint8)
    path = str(tmp_path / "sem.tiff")
    _write_sem_tiff(path, img)

    meta = read_metadata(path)
    assert meta.scale == (9.7656e-008, 9.7656e-008)
    assert meta.tilt_angle == pytest.approx(0.1745329)
    assert meta.databar_height == 60
    assert meta.focal_length_35mm is None

    src = SourceImage.load(path)
    # Databar is cropped off the bottom (reconstruction.rs:43).
    assert src.shape == (512 - 60, 512)
    np.testing.assert_array_equal(src.img, img[:452])


def test_plain_png_defaults(tmp_path, rng):
    img = rng.randint(0, 256, (64, 80), dtype=np.uint8)
    path = str(tmp_path / "plain.png")
    Image.fromarray(img).save(path)
    src = SourceImage.load(path)
    assert src.shape == (64, 80)
    assert src.scale == (1.0, 1.0)
    assert src.tilt_angle is None
    assert src.dimensions == (80, 64)


def test_exif_focal_length(tmp_path, rng):
    img = rng.randint(0, 256, (64, 64), dtype=np.uint8)
    path = str(tmp_path / "photo.jpg")
    pil = Image.fromarray(img)
    exif = Image.Exif()
    exif[41989] = 35  # FocalLengthIn35mmFilm
    pil.save(path, exif=exif)
    meta = read_metadata(path)
    assert meta.focal_length_35mm == 35


def test_calibration_matrix():
    img = np.zeros((3024, 4032), dtype=np.uint8)
    src = SourceImage(img, focal_length_35mm=28)
    k = src.calibration_matrix()
    diagonal = np.hypot(4032.0, 3024.0)
    diagonal_35 = np.hypot(24.0, 36.0)
    expected_f = 28.0 * diagonal / diagonal_35
    assert k[0, 0] == pytest.approx(expected_f)
    assert k[1, 1] == pytest.approx(expected_f)
    assert k[0, 2] == pytest.approx(4032 / 2)
    assert k[1, 2] == pytest.approx(3024 / 2)
    assert k[2, 2] == 1.0
    # Explicit CLI focal length overrides metadata (reconstruction.rs:170).
    k2 = src.calibration_matrix(56)
    assert k2[0, 0] == pytest.approx(2 * expected_f)
    # No focal length falls back to 1 (reconstruction.rs:170).
    src_none = SourceImage(img)
    assert src_none.calibration_matrix()[0, 0] == pytest.approx(diagonal / diagonal_35)


def test_resize_dims(rng):
    img = rng.randint(0, 256, (301, 503), dtype=np.uint8)
    # Truncating casts, like `(w as f32 * scale) as u32` (reconstruction.rs:148-150).
    out = resize_lanczos(img, 0.5)
    assert out.shape == (150, 251)
    assert out.dtype == np.uint8
    assert resize_lanczos(img, 1.0) is img


def test_scale_steps():
    # orb.rs:407-415 with min size 256; correlation/mod.rs:542-550 with 64.
    assert optimal_scale_steps((1024, 1024), 256) == 2
    assert optimal_scale_steps((1024, 1024), 64) == 4
    assert optimal_scale_steps((256, 256), 256) == 0
    assert optimal_scale_steps((64, 4096), 64) == 0
    assert optimal_scale_steps((4032, 3024), 64) == 5
    assert pyramid_scales((1024, 1024), 64) == [1 / 16, 1 / 8, 1 / 4, 1 / 2, 1.0]
