"""Pure-NumPy float64 oracles for texture kernels.

skimage is not installed in this environment, so these re-implement the
documented algorithms of skimage.graycomatrix/graycoprops,
skimage.feature.local_binary_pattern(method='uniform') and
skimage.filters.rank.entropy directly in NumPy for use as test references.
"""

import math

import numpy as np


def graycomatrix(window, distances, angles, levels, symmetric=True, normed=True):
    ws = window.shape[0]
    out = np.zeros((levels, levels, len(distances), len(angles)), np.float64)
    for di, d in enumerate(distances):
        for ai, a in enumerate(angles):
            dr = int(round(math.sin(a) * d))
            dc = int(round(math.cos(a) * d))
            for r in range(ws):
                for c in range(window.shape[1]):
                    r2, c2 = r + dr, c + dc
                    if 0 <= r2 < ws and 0 <= c2 < window.shape[1]:
                        out[window[r, c], window[r2, c2], di, ai] += 1
    if symmetric:
        out = out + out.transpose(1, 0, 2, 3)
    if normed:
        s = out.sum(axis=(0, 1), keepdims=True)
        s[s == 0] = 1
        out = out / s
    return out


def graycoprops(P, prop):
    levels = P.shape[0]
    i = np.arange(levels, dtype=np.float64)[:, None, None, None]
    j = np.arange(levels, dtype=np.float64)[None, :, None, None]
    diff = i - j
    if prop == "contrast":
        return (P * diff ** 2).sum(axis=(0, 1))
    if prop == "dissimilarity":
        return (P * np.abs(diff)).sum(axis=(0, 1))
    if prop == "homogeneity":
        return (P / (1 + diff ** 2)).sum(axis=(0, 1))
    if prop == "energy":
        return np.sqrt((P ** 2).sum(axis=(0, 1)))
    if prop == "correlation":
        mean_i = (P * i).sum(axis=(0, 1))
        mean_j = (P * j).sum(axis=(0, 1))
        var_i = (P * (i - mean_i) ** 2).sum(axis=(0, 1))
        var_j = (P * (j - mean_j) ** 2).sum(axis=(0, 1))
        std = np.sqrt(var_i * var_j)
        cov = (P * (i - mean_i) * (j - mean_j)).sum(axis=(0, 1))
        out = np.ones_like(cov)
        ok = std >= 1e-15
        out[ok] = cov[ok] / std[ok]
        return out
    raise ValueError(prop)


def local_binary_pattern_uniform(image, P, R):
    """skimage LBP 'uniform': circular bilinear samples (coords rounded to
    5 decimals), >= center sign, transitions counted over the linear
    sequence, out-of-bounds samples read 0."""
    h, w = image.shape
    img = image.astype(np.float64)
    rp = np.round(-R * np.sin(2 * np.pi * np.arange(P) / P), 5)
    cp = np.round(R * np.cos(2 * np.pi * np.arange(P) / P), 5)
    out = np.zeros((h, w), np.float64)
    for r in range(h):
        for c in range(w):
            s = np.zeros(P, np.int64)
            for k in range(P):
                rr, cc = r + rp[k], c + cp[k]
                r0, c0 = math.floor(rr), math.floor(cc)
                fr, fc = rr - r0, cc - c0
                gp = 0.0
                for (dy, dx, wgt) in ((r0, c0, (1 - fr) * (1 - fc)),
                                      (r0, c0 + 1, (1 - fr) * fc),
                                      (r0 + 1, c0, fr * (1 - fc)),
                                      (r0 + 1, c0 + 1, fr * fc)):
                    if wgt == 0:
                        continue
                    v = img[dy, dx] if (0 <= dy < h and 0 <= dx < w) else 0.0
                    gp += v * wgt
                s[k] = 1 if gp - img[r, c] >= 0 else 0
            changes = int(np.sum(s[1:] != s[:-1]))
            out[r, c] = s.sum() if changes <= 2 else P + 1
    return out


def rank_entropy(image_u8, radius):
    """skimage.filters.rank.entropy equivalent: Shannon entropy (bits) of the
    histogram over a disk footprint intersected with the image."""
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    fp = (x * x + y * y <= radius * radius)
    h, w = image_u8.shape
    out = np.zeros((h, w), np.float64)
    offs = [(dy, dx) for dy in range(-radius, radius + 1)
            for dx in range(-radius, radius + 1) if fp[dy + radius, dx + radius]]
    for r in range(h):
        for c in range(w):
            vals = [image_u8[r + dy, c + dx] for dy, dx in offs
                    if 0 <= r + dy < h and 0 <= c + dx < w]
            counts = np.bincount(np.asarray(vals, np.int64), minlength=256)
            p = counts[counts > 0] / len(vals)
            out[r, c] = -(p * np.log2(p)).sum()
    return out
