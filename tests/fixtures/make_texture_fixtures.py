#!/usr/bin/env python3
"""Generate texture golden fixtures from FIRST PRINCIPLES.

skimage is not installed in this environment, so these fixtures are produced
by a deliberately naive, human-reviewable transcription of the documented
algorithms — direct pair enumeration for GLCM (graycomatrix docstring:
"the number of times gray-level j occurs at offset
(round(sin(a)*d), round(cos(a)*d)) from gray-level i"), direct windowed
histograms for rank entropy — NOT by importing either tests/oracles.py or
the device kernels under test. tests/test_texture_golden.py additionally
pins several values that were derived fully by hand (fractions worked on
paper) to guard against a shared misreading here.

Run once; the .npz output is committed.
"""

import math

import numpy as np

RNG = np.random.default_rng(20260816)


def glcm_pairs(window: np.ndarray, levels: int, distance: int,
               angle: float) -> np.ndarray:
    """Count co-occurrences by looping over every pixel pair (naive)."""
    dr = int(round(math.sin(angle) * distance))
    dc = int(round(math.cos(angle) * distance))
    h, w = window.shape
    cm = np.zeros((levels, levels), np.float64)
    for r in range(h):
        for c in range(w):
            r2, c2 = r + dr, c + dc
            if 0 <= r2 < h and 0 <= c2 < w:
                cm[window[r, c], window[r2, c2]] += 1
    return cm


def glcm_symmetric_normed(window, levels, distance, angle):
    cm = glcm_pairs(window, levels, distance, angle)
    cm = cm + cm.T
    s = cm.sum()
    return cm / s if s > 0 else cm


def props(p: np.ndarray) -> dict:
    """graycoprops formulas, straight from the documented definitions."""
    levels = p.shape[0]
    i = np.arange(levels, dtype=np.float64)[:, None]
    j = np.arange(levels, dtype=np.float64)[None, :]
    out = {
        "contrast": (p * (i - j) ** 2).sum(),
        "dissimilarity": (p * np.abs(i - j)).sum(),
        "homogeneity": (p / (1.0 + (i - j) ** 2)).sum(),
        "energy": math.sqrt((p * p).sum()),
    }
    mu_i = (p * i).sum()
    mu_j = (p * j).sum()
    var_i = (p * (i - mu_i) ** 2).sum()
    var_j = (p * (j - mu_j) ** 2).sum()
    cov = (p * (i - mu_i) * (j - mu_j)).sum()
    std = math.sqrt(var_i * var_j)
    out["correlation"] = 1.0 if std < 1e-15 else cov / std
    return out


def entropy_disk(img_u8: np.ndarray, radius: int) -> np.ndarray:
    """skimage.filters.rank.entropy: per-pixel Shannon entropy (bits) of the
    gray-level histogram over a disk footprint clipped to the image."""
    h, w = img_u8.shape
    ys, xs = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    fp = (ys * ys + xs * xs) <= radius * radius
    offs = np.argwhere(fp) - radius
    out = np.zeros((h, w), np.float64)
    for r in range(h):
        for c in range(w):
            vals = []
            for dy, dx in offs:
                r2, c2 = r + dy, c + dx
                if 0 <= r2 < h and 0 <= c2 < w:
                    vals.append(img_u8[r2, c2])
            counts = np.bincount(np.asarray(vals))
            pr = counts[counts > 0] / len(vals)
            out[r, c] = -(pr * np.log2(pr)).sum()
    return out


def main() -> None:
    angles = (0.0, math.pi / 2)  # unambiguous offsets; pi/4 vs 3pi/4 swap
    # under reflection, so diagonal angles are fixture-tested only through
    # their MEAN (which the reference consumes, indices.py:290-296)
    diag = (math.pi / 4, 3 * math.pi / 4)

    windows = [
        np.array([[0, 0, 1, 1],
                  [0, 0, 1, 1],
                  [0, 2, 2, 2],
                  [2, 2, 3, 3]], np.int32),                 # hand-checked
        RNG.integers(0, 5, (5, 5)).astype(np.int32),
        RNG.integers(0, 8, (7, 7)).astype(np.int32),
        np.zeros((4, 4), np.int32),                         # degenerate
    ]
    levels = [4, 5, 8, 4]

    data = {}
    for k, (win, lv) in enumerate(zip(windows, levels)):
        data[f"win{k}"] = win
        data[f"win{k}_levels"] = np.int32(lv)
        for ai, a in enumerate(angles):
            p = glcm_symmetric_normed(win, lv, 1, a)
            data[f"win{k}_glcm_a{ai}"] = p.astype(np.float64)
            pr = props(p)
            data[f"win{k}_props_a{ai}"] = np.array(
                [pr["contrast"], pr["dissimilarity"], pr["homogeneity"],
                 pr["energy"], pr["correlation"]])
        # mean over the reference's 4 angles (reflection-invariant)
        all4 = [props(glcm_symmetric_normed(win, lv, 1, a))
                for a in angles + diag]
        data[f"win{k}_props_mean4"] = np.array(
            [np.mean([p[name] for p in all4])
             for name in ("contrast", "dissimilarity", "homogeneity",
                          "energy", "correlation")])

    img = RNG.integers(0, 4, (9, 9)).astype(np.uint8)  # few levels -> short
    data["entropy_img"] = img
    data["entropy_r1"] = entropy_disk(img, 1)
    data["entropy_r2"] = entropy_disk(img, 2)

    np.savez("tests/fixtures/texture_golden.npz", **data)
    print("wrote tests/fixtures/texture_golden.npz:", sorted(data))


if __name__ == "__main__":
    main()
