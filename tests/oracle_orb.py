"""Literal NumPy re-implementation of the reference's FAST detector
(orb.rs:86-188, 425-453) used as a test oracle. Deliberately loop-based and
slow — it encodes the reference semantics, not TPU style.
"""

import numpy as np

FAST_CIRCLE = [
    (0, -3), (1, -3), (2, -2), (3, -1),
    (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1),
    (-3, 0), (-3, -1), (-2, -2), (-1, -3),
]
FAST_NUM_POINTS = 9
FAST_CIRCLE_LENGTH = len(FAST_CIRCLE) + FAST_NUM_POINTS - 1


def adjust_contrast(img):
    lo, hi = int(img.min()), int(img.max())
    if lo >= hi:
        return img.copy()
    coeff = np.float32(255.0) / np.float32(hi - lo)
    # f32.round() rounds half away from zero (floor(x+0.5) for x >= 0).
    return np.floor(
        coeff * (img.astype(np.float32) - np.float32(lo)) + np.float32(0.5)
    ).astype(np.int32)


def is_keypoint(img, threshold, x, y):
    """orb.rs:425-453 — circular run of >=9 brighter or darker taps."""
    val = int(img[y, x])
    last_more = None
    last_less = None
    max_length = 0
    for i in range(FAST_CIRCLE_LENGTH):
        dx, dy = FAST_CIRCLE[i % 16]
        c_val = int(img[y + dy, x + dx])
        if c_val > val + threshold:
            last_more = i if last_more is None else last_more
            max_length = max(max_length, i - last_more + 1)
        else:
            last_more = None
        if c_val < val - threshold:
            last_less = i if last_less is None else last_less
            max_length = max(max_length, i - last_less + 1)
        else:
            last_less = None
        if max_length >= FAST_NUM_POINTS:
            return True
    return False


def fast_score(img, x, y, start_threshold=15):
    """Binary search for the max passing threshold (orb.rs:122-134)."""
    t_min, t_max = start_threshold, 255
    t = (t_min + t_max) // 2
    while t_max > t_min + 1:
        if is_keypoint(img, t, x, y):
            t_min = t
        else:
            t_max = t
        t = (t_min + t_max) // 2
    return t_min


def find_fast_keypoints(img, threshold=15):
    """Detection + scoring + 3x3 NMS (orb.rs:86-188). Returns a list of
    (x, y) in row-major detection order."""
    h, w = img.shape
    kps = []
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            if is_keypoint(img, threshold, x, y):
                kps.append((x, y))
    scores = {p: fast_score(img, p[0], p[1], threshold) for p in kps}
    kept = []
    kp_set = set(kps)
    for x, y in kps:
        s = scores[(x, y)]
        suppressed = False
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                q = (x + dx, y + dy)
                if q in kp_set and scores[q] >= s:
                    suppressed = True
        if not suppressed:
            kept.append((x, y))
    return kps, scores, kept
