"""Literal NumPy re-implementation of the reference's dense correlation
(correlation/mod.rs:217-624) used as a parity oracle. Per-pixel Python
loops with vectorized inner NCC — encodes reference semantics exactly,
intended only for tiny test images.
"""

import math

import numpy as np

KS = 5
KW = 11
KPC = 121


def round_half_away(v: float) -> float:
    """Rust f64::round: halves go AWAY from zero (2.5 -> 3, -2.5 -> -3).
    Python's round() is half-to-even and diverges on every exact half,
    which the corridor math hits systematically (stdev == 0 corridors
    have length round(2.5))."""
    return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)


def point_data(img, x, y):
    """compute_point_data (mod.rs:702-735): zero-mean 11x11 patch + stdev."""
    h, w = img.shape
    if x < KS or y < KS or x + KS >= w or y + KS >= h:
        return None
    patch = img[y - KS : y + KS + 1, x - KS : x + KS + 1].astype(np.float32)
    avg = patch.mean()
    delta = patch - avg
    stdev = np.sqrt((delta * delta).mean())
    return delta, stdev


def image_point_data(img):
    """compute_image_point_data (mod.rs:632-694): per-pixel window avg/stdev."""
    h, w = img.shape
    avg = np.full((h, w), np.nan, np.float32)
    std = np.full((h, w), np.nan, np.float32)
    for y in range(KS, h - KS):
        for x in range(KS, w - KS):
            patch = img[y - KS : y + KS + 1, x - KS : x + KS + 1].astype(np.float32)
            avg[y, x] = patch.mean()
            std[y, x] = np.sqrt(((patch - patch.mean()) ** 2).mean())
    return avg, std


def epipolar_line(fmat, x, y, scale):
    """get_epipolar_line (mod.rs:386-409)."""
    p1 = np.array([x / scale, y / scale, 1.0])
    fp = fmat @ p1
    if abs(fp[0]) > abs(fp[1]):
        coeff = (-fp[1] / fp[0], 1.0)
        add = (-scale * fp[2] / fp[0], 0.0)
        corridor_offset = (1, 0)
    else:
        coeff = (1.0, -fp[0] / fp[1])
        add = (0.0, -scale * fp[2] / fp[1])
        corridor_offset = (0, 1)
    return coeff, add, corridor_offset


def estimate_search_range(
    state, x, y, scale, coeff, add, corridor_start, corridor_end,
    neighbor_distance, min_range, extend_range,
):
    """mod.rs:468-540. `state` is the full-resolution dict with pos/valid."""
    x_min = int(np.floor(max(x - neighbor_distance, 0) / scale))
    x_max = int(np.ceil((x + neighbor_distance) / scale))
    y_min = int(np.floor(max(y - neighbor_distance, 0) / scale))
    y_max = int(np.ceil((y + neighbor_distance) / scale))
    h, w = state["valid"].shape
    x_min, x_max = np.clip([x_min, x_max], 0, w)
    y_min, y_max = np.clip([y_min, y_max], 0, h)

    vertical = abs(coeff[1]) > abs(coeff[0])
    positions = []
    for yy in range(y_min, y_max):
        for xx in range(x_min, x_max):
            if not state["valid"][yy, xx]:
                continue
            px2 = scale * state["pos_x"][yy, xx]
            py2 = scale * state["pos_y"][yy, xx]
            if vertical:
                positions.append((py2 - add[1]) / coeff[1])
            else:
                positions.append((px2 - add[0]) / coeff[0])
    if not positions:
        return None
    positions = np.array(positions)
    mid = positions.mean()
    stdev = np.sqrt(((positions - mid) ** 2).mean())
    center = int(round_half_away(mid))
    length = int(round_half_away(min_range + stdev * extend_range))
    start = int(np.clip(max(center - length, 0), corridor_start, corridor_end))
    end = int(np.clip(center + length, start, corridor_end))
    return start, end


def correlate_step(
    img1, img2, fmat, scale, state, first_pass,
    threshold=0.6, min_stdev=1.0, corridor_size=2,
    neighbor_distance=10, min_range=2.5, extend_range=1.0,
):
    """correlate_images_step (mod.rs:247-319) for one direction. Returns a
    new full-resolution state dict (entries written at (x/scale, y/scale))."""
    h1, w1 = img1.shape
    h2, w2 = img2.shape
    avg2, std2 = image_point_data(img2)
    h0 = state["valid"].shape[0]
    w0 = state["valid"].shape[1]
    out = {
        "pos_x": state["pos_x"].copy(),
        "pos_y": state["pos_y"].copy(),
        "corr": state["corr"].copy(),
        "valid": state["valid"].copy(),
    }
    # The reference writes every out_data cell (including None) back into
    # the full-res grid at (x/scale, y/scale) — replicate by resetting
    # those cells first.
    for y in range(h1):
        for x in range(w1):
            ox, oy = int(x / scale), int(y / scale)
            out["valid"][oy, ox] = False

    for y in range(KS, h1 - KS):
        for x in range(KS, w1 - KS):
            pd = point_data(img1, x, y)
            if pd is None:
                continue
            delta1, stdev1 = pd
            if not np.isfinite(stdev1) or abs(stdev1) < min_stdev:
                continue
            coeff, add, _off = epipolar_line(fmat, x, y, scale)
            if not all(np.isfinite([coeff[0], coeff[1], add[0], add[1]])):
                continue
            corridor_end = (
                w2 - KS if abs(coeff[0]) > abs(coeff[1]) else h2 - KS
            )
            if first_pass:
                rng = (KS, corridor_end)
            else:
                rng = estimate_search_range(
                    state, x, y, scale, coeff, add, KS, corridor_end,
                    neighbor_distance, min_range, extend_range,
                )
                if rng is None:
                    continue
            best_corr = None
            best_pos = None
            for off in range(-corridor_size, corridor_size + 1):
                for i in range(rng[0], rng[1]):
                    x2 = int(np.floor(coeff[0] * i + add[0]))
                    y2 = int(np.floor(coeff[1] * i + add[1]))
                    if abs(coeff[0]) > abs(coeff[1]):
                        x2 += off
                    else:
                        y2 += off
                    if x2 < KS or x2 >= w2 - KS or y2 < KS or y2 >= h2 - KS:
                        continue
                    a2 = avg2[y2, x2]
                    s2 = std2[y2, x2]
                    if not np.isfinite(s2) or abs(s2) < min_stdev:
                        continue
                    patch2 = img2[
                        y2 - KS : y2 + KS + 1, x2 - KS : x2 + KS + 1
                    ].astype(np.float32)
                    corr = float(
                        (delta1 * (patch2 - a2)).sum() / (stdev1 * s2 * KPC)
                    )
                    if corr >= threshold and (best_corr is None or corr > best_corr):
                        best_corr = corr
                        best_pos = (
                            int(round(x2 / scale)),
                            int(round(y2 / scale)),
                        )
            ox, oy = int(x / scale), int(y / scale)
            if best_pos is not None:
                out["pos_x"][oy, ox] = best_pos[0]
                out["pos_y"][oy, ox] = best_pos[1]
                out["corr"][oy, ox] = best_corr
                out["valid"][oy, ox] = True
    return out


def cross_check(state, reverse, scale, search_area=4):
    """cross_check_filter (mod.rs:552-624) on full-resolution state dicts."""
    sa = search_area * int(round(1.0 / scale))
    h, w = state["valid"].shape
    hr, wr = reverse["valid"].shape
    out = {k: v.copy() for k, v in state.items()}
    for y in range(h):
        for x in range(w):
            if not state["valid"][y, x]:
                continue
            mx, my = state["pos_x"][y, x], state["pos_y"][y, x]
            keep = False
            for sy in range(max(my - sa, 0), min(my + sa + 1, hr)):
                for sx in range(max(mx - sa, 0), min(mx + sa + 1, wr)):
                    if not reverse["valid"][sy, sx]:
                        continue
                    rx, ry = reverse["pos_x"][sy, sx], reverse["pos_y"][sy, sx]
                    if (
                        x - sa <= rx < x + sa + 1
                        and y - sa <= ry < y + sa + 1
                    ):
                        keep = True
                        break
                if keep:
                    break
            if not keep:
                out["valid"][y, x] = False
    return out


def empty_state(h0, w0):
    return {
        "pos_x": np.zeros((h0, w0), np.int64),
        "pos_y": np.zeros((h0, w0), np.int64),
        "corr": np.full((h0, w0), -1.0, np.float32),
        "valid": np.zeros((h0, w0), bool),
    }


def correlate_images_oracle(
    img1, img2, fmat, scales, resize, threshold=0.6, min_stdev=1.0,
    corridor_size=2, min_range=2.5, extend_range=1.0,
):
    """Full coarse-to-fine driver with reference semantics
    (correlation/mod.rs:217-245 per scale: forward step, reverse step,
    cross-check Forward against unfiltered Reverse, then Reverse against
    the already-filtered Forward). Returns the forward full-res state."""
    h0, w0 = img1.shape
    sf = empty_state(h0, w0)
    sr = empty_state(h0, w0)
    for si, s in enumerate(scales):
        i1, i2 = resize(img1, s), resize(img2, s)
        kw = dict(
            threshold=threshold, min_stdev=min_stdev,
            corridor_size=corridor_size, min_range=min_range,
            extend_range=extend_range,
        )
        sf = correlate_step(i1, i2, fmat, s, sf, first_pass=(si == 0), **kw)
        sr = correlate_step(i2, i1, fmat.T, s, sr, first_pass=(si == 0), **kw)
        sf_new = cross_check(sf, sr, s)
        sr = cross_check(sr, sf_new, s)
        sf = sf_new
    return sf
