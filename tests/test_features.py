"""ORB feature tests against a literal NumPy oracle of orb.rs."""

import jax.numpy as jnp
import numpy as np
import pytest

from cybervision_tpu.config import OrbConfig
from cybervision_tpu.ops import features

from . import oracle_orb


def _random_img(rng, h=48, w=56):
    # Blocky random image produces plenty of FAST corners.
    base = rng.randint(0, 256, (h // 4, w // 4)).astype(np.uint8)
    return np.kron(base, np.ones((4, 4), dtype=np.uint8))


def test_adjust_contrast_matches_oracle(rng):
    img = rng.randint(30, 180, (16, 16)).astype(np.uint8)
    ours = np.asarray(features.adjust_contrast(jnp.asarray(img, dtype=jnp.int32)))
    oracle = oracle_orb.adjust_contrast(img)
    # f32 round-half differences may flip the odd pixel by 1.
    assert np.max(np.abs(ours.astype(int) - oracle.astype(int))) <= 1


def test_adjust_contrast_constant_image():
    img = jnp.full((8, 8), 77, dtype=jnp.int32)
    out = np.asarray(features.adjust_contrast(img))
    np.testing.assert_array_equal(out, 77)


def test_fast_detection_and_scores_match_oracle(rng):
    img = _random_img(rng)
    stretched = oracle_orb.adjust_contrast(img)

    score = np.asarray(features.fast_scores(jnp.asarray(stretched), 15))
    kps, oracle_scores, kept = oracle_orb.find_fast_keypoints(stretched, 15)

    detected = {(x, y) for y, x in zip(*np.nonzero(score >= 0))}
    assert detected == set(kps)
    assert len(kps) > 10  # non-trivial test image
    for (x, y), s in oracle_scores.items():
        assert score[y, x] == s, (x, y)

    keep = np.asarray(features.non_max_suppression(jnp.asarray(score)))
    ours_kept = {(x, y) for y, x in zip(*np.nonzero(keep))}
    assert ours_kept == set(kept)


def test_harris_response_corner_beats_flat():
    img = np.zeros((32, 32), dtype=np.uint8)
    img[16:, 16:] = 200  # a strong corner at (16,16)
    resp = np.asarray(features.harris_response(jnp.asarray(img, dtype=jnp.int32), OrbConfig()))
    corner = resp[14:18, 14:18].max()
    flat = resp[8, 8]
    edge = resp[8, 16]  # vertical edge
    assert corner > 0
    assert flat == pytest.approx(0.0, abs=1e-9)
    assert edge < corner  # edges score below corners (negative for pure edge)


def test_gaussian_kernel_values():
    k = features.gaussian_kernel(11)
    assert k.shape == (11,)
    assert k[5] == max(k)
    # sigma = 10/6; value at center = 1/(sqrt(2pi)*sigma)
    assert k[5] == pytest.approx(1.0 / (np.sqrt(2 * np.pi) * (10 / 6)))
    np.testing.assert_allclose(k, k[::-1])


def test_orientation_points_towards_bright_side():
    cfg = OrbConfig()
    img = np.zeros((64, 64), dtype=np.uint8)
    img[:, 32:] = 200  # bright on +x side
    blurred, valid = features.gaussian_blur(jnp.asarray(img, dtype=jnp.int32), cfg)
    pts = jnp.asarray([[32, 32]], dtype=jnp.int32)
    angle, ok = features.orientations(blurred, valid, pts, cfg)
    assert bool(ok[0])
    assert abs(float(angle[0])) < 0.1  # points along +x

    img_down = np.zeros((64, 64), dtype=np.uint8)
    img_down[32:, :] = 200  # bright on +y side
    blurred, valid = features.gaussian_blur(jnp.asarray(img_down, dtype=jnp.int32), cfg)
    angle, ok = features.orientations(blurred, valid, pts, cfg)
    assert bool(ok[0])
    assert abs(float(angle[0]) - np.pi / 2) < 0.1


def test_orientation_border_invalid(rng):
    cfg = OrbConfig()
    img = jnp.asarray(rng.randint(1, 255, (64, 64)), dtype=jnp.int32)
    blurred, valid = features.gaussian_blur(img, cfg)
    pts = jnp.asarray([[19, 32], [20, 32], [32, 38], [32, 39]], dtype=jnp.int32)
    _, ok = features.orientations(blurred, valid, pts, cfg)
    # x margin = 15 (patch) + 5 (blur) = 20: x in [20, 64-21].
    # y margin = 15 + 2*5 = 25 (the reference's double-masked blur band):
    # y in [25, 64-26].
    assert list(np.asarray(ok)) == [False, True, True, False]


def test_extract_keypoints_end_to_end(rng):
    # Full-resolution noise: blocky textures produce tied FAST scores whose
    # mutual NMS elimination leaves too few corners to test with.
    img = rng.randint(0, 256, (96, 96)).astype(np.uint8)
    out = features.extract_keypoints(jnp.asarray(img), OrbConfig())
    valid = np.asarray(out["valid"])
    pts = np.asarray(out["pts"])[valid]
    desc = np.asarray(out["desc"])[valid]
    assert valid.sum() > 20
    assert desc.shape[1] == 8 and desc.dtype == np.uint32
    # All keypoints respect the BRIEF margins.
    assert pts.min() >= 4
    assert pts.max() < 96 - 4
    # Descriptors are deterministic.
    out2 = features.extract_keypoints(jnp.asarray(img), OrbConfig())
    np.testing.assert_array_equal(np.asarray(out2["desc"])[valid], desc)


def test_extract_keypoints_image_smaller_than_patch(rng):
    """Images smaller than the 45x45 BRIEF patch must degrade to zero
    valid keypoints, not a trace-time dynamic_slice error (regression:
    the vmapped patch slice required operand dims >= patch width)."""
    img = rng.randint(0, 256, (32, 40)).astype(np.uint8)
    out = features.extract_keypoints(jnp.asarray(img), OrbConfig())
    assert not np.asarray(out["valid"]).any()


def test_descriptor_shift_invariance(rng):
    """The same texture at two locations yields identical descriptors."""
    cfg = OrbConfig()
    patch = rng.randint(0, 256, (41, 41)).astype(np.uint8)
    img = np.zeros((128, 128), dtype=np.uint8)
    img[20:61, 20:61] = patch
    img[60:101, 70:111] = patch
    blurred, valid = features.gaussian_blur(jnp.asarray(img, dtype=jnp.int32), cfg)
    pts = jnp.asarray([[40, 40], [90, 80]], dtype=jnp.int32)
    angles, ok = features.orientations(blurred, valid, pts, cfg)
    desc, dvalid = features.brief_descriptors(blurred, pts, angles, cfg)
    assert bool(ok.all()) and bool(dvalid.all())
    np.testing.assert_array_equal(np.asarray(desc[0]), np.asarray(desc[1]))


def test_descriptor_rotation_binning(rng):
    """Descriptors are constant within an angle bin and generally change
    across bins (the binned rotated-BRIEF contract)."""
    cfg = OrbConfig()
    img = rng.randint(0, 256, (128, 128)).astype(np.uint8)
    blurred, _ = features.gaussian_blur(jnp.asarray(img, dtype=jnp.int32), cfg)
    pts = jnp.asarray([[64, 64]] * 3, dtype=jnp.int32)
    step = 2 * np.pi / features.N_ANGLE_BINS
    angles = jnp.asarray([0.0, 0.4 * step, 1.0 * step], jnp.float32)
    desc, dvalid = features.brief_descriptors(blurred, pts, angles, cfg)
    assert bool(dvalid.all())
    d = np.asarray(desc)
    np.testing.assert_array_equal(d[0], d[1])  # same bin
    assert (d[0] != d[2]).any()  # neighboring bin rotates the pattern


def test_brief_gather_matches_matmul(rng):
    """The gather and MXU-matmul BRIEF formulations are bit-identical
    (brief_descriptors docstring: bit t is v1 - v0 > 0 either way,
    including the coinciding-taps cancellation)."""
    cfg = OrbConfig()
    img = rng.randint(0, 256, (96, 128)).astype(np.uint8)
    blurred, _ = features.gaussian_blur(jnp.asarray(img, dtype=jnp.int32), cfg)
    pts = jnp.asarray(
        rng.randint(0, 90, (64, 2)), dtype=jnp.int32
    )
    angles = jnp.asarray(rng.uniform(-np.pi, np.pi, 64), jnp.float32)
    d_mm, v_mm = features.brief_descriptors(
        blurred, pts, angles, cfg, use_gather=False
    )
    d_g, v_g = features.brief_descriptors(
        blurred, pts, angles, cfg, use_gather=True
    )
    np.testing.assert_array_equal(np.asarray(d_mm), np.asarray(d_g))
    np.testing.assert_array_equal(np.asarray(v_mm), np.asarray(v_g))


def test_pair_batched_extraction_matches_per_image():
    """One batched extract_keypoints_pyramid_packed([a, b]) call (the
    stereopair fast path in Reconstruction._orb_packed_pair) is
    bit-identical per image to two single-image calls: detection and
    description are elementwise/per-image batched ops, and the describe
    bucket is sized by the same density bound either way."""
    from bench import synth_sem_pair

    cfg = OrbConfig()
    img1, img2 = synth_sem_pair(160, 192, seed=7)
    both = features.extract_keypoints_pyramid_packed([img1, img2], cfg)
    (one,) = features.extract_keypoints_pyramid_packed([img1], cfg)
    (two,) = features.extract_keypoints_pyramid_packed([img2], cfg)
    np.testing.assert_array_equal(np.asarray(both[0]), np.asarray(one))
    np.testing.assert_array_equal(np.asarray(both[1]), np.asarray(two))
