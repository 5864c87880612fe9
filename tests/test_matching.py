"""Descriptor matching tests against a literal XOR/popcount oracle
(pointmatching.rs:43-77)."""

import jax.numpy as jnp
import numpy as np

from cybervision_tpu.ops import matching


def _hamming_oracle(d1, d2):
    """(N1, N2) Hamming distances via XOR + popcount over 8 u32 words."""
    x = d1[:, None, :] ^ d2[None, :, :]
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(axis=-1)


def test_match_descriptors_against_oracle(rng):
    n1, n2 = 37, 53
    d1 = rng.randint(0, 2**32, (n1, 8), dtype=np.uint64).astype(np.uint32)
    d2 = rng.randint(0, 2**32, (n2, 8), dtype=np.uint64).astype(np.uint32)
    # Plant exact duplicates so some distances are 0.
    d2[7] = d1[3]
    d2[11] = d1[20]

    dist = _hamming_oracle(d1, d2)
    oracle_best = dist.argmin(axis=1)
    oracle_dist = dist.min(axis=1)

    idx, best_d, ok = matching.match_descriptors(
        jnp.asarray(d1),
        jnp.ones(n1, dtype=bool),
        jnp.asarray(d2),
        jnp.ones(n2, dtype=bool),
        threshold=300,
        chunk=16,
    )
    np.testing.assert_array_equal(np.asarray(best_d), oracle_dist)
    np.testing.assert_array_equal(np.asarray(idx), oracle_best)
    assert bool(np.asarray(ok).all())
    assert best_d[3] == 0 and idx[3] == 7
    assert best_d[20] == 0 and idx[20] == 11


def test_match_threshold_and_validity(rng):
    d1 = rng.randint(0, 2**32, (8, 8), dtype=np.uint64).astype(np.uint32)
    d2 = rng.randint(0, 2**32, (8, 8), dtype=np.uint64).astype(np.uint32)
    d2[0] = d1[0]
    dist = _hamming_oracle(d1, d2)

    valid2 = np.ones(8, dtype=bool)
    valid2[dist[1].argmin()] = False  # knock out row 1's best
    idx, best_d, ok = matching.match_descriptors(
        jnp.asarray(d1),
        jnp.ones(8, dtype=bool),
        jnp.asarray(d2),
        jnp.asarray(valid2),
        threshold=32,
        chunk=8,
    )
    # Row 0 is an exact duplicate: matched within any threshold.
    assert bool(ok[0]) and best_d[0] == 0
    # Row 1's forced second choice must differ from the oracle best.
    assert idx[1] != dist[1].argmin()
    # Random 256-bit strings have expected distance 128 >> 32: unmatched.
    assert not bool(ok[1])


def test_match_keypoints_sorted(rng):
    n = 24
    pts1 = rng.randint(0, 100, (n, 2))
    pts2 = rng.randint(0, 100, (n, 2))
    desc = rng.randint(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
    # Identical descriptor sets, shuffled.
    perm = rng.permutation(n)
    matches = matching.match_keypoints(pts1, desc, pts2[perm], desc[perm], threshold=32)
    assert matches.shape == (n, 4)
    # Every match pairs the same descriptor: x2,y2 must be the permuted pts2.
    lookup = {tuple(p): tuple(q) for p, q in zip(pts1, pts2)}
    for x1, y1, x2, y2 in matches:
        assert lookup[(x1, y1)] == (x2, y2)


def test_match_keypoints_packed_parity():
    """The device-resident sparse path (packed ORB rows -> masked matcher
    -> one fetch) must be bit-identical to the host flow (fetch
    descriptors, compact invalid slots, re-upload, match): compaction
    preserves row order, so the argmin lowest-index tie rule picks the
    same keypoint, and masked slots can't win (distance 257 > 256)."""
    from bench import synth_sem_pair

    from cybervision_tpu.config import OrbConfig
    from cybervision_tpu.ops import features

    img1, img2 = synth_sem_pair(192, 160, seed=5)
    cfg = OrbConfig()
    (p1, d1), (p2, d2) = features.extract_keypoints_pyramid_multi(
        [img1, img2], cfg
    )
    host = matching.match_keypoints(p1, d1, p2, d2, 32)
    packed = features.extract_keypoints_pyramid_packed([img1, img2], cfg)
    dev, n1, n2 = matching.match_keypoints_packed(packed[0], packed[1], 32)
    assert (n1, n2) == (len(p1), len(p2))
    assert np.array_equal(host, dev)
