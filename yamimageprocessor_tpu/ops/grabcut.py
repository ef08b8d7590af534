"""Rect-initialized foreground extraction (cv2.grabCut capability).

Reference: ``core/segmentation.py:237-247`` — grabCut with a 10-px-inset
rect, 5 iterations, then foreground masking + Otsu.

cv2's GrabCut alternates GMM color models with a graph min-cut.  A serial
max-flow is a poor fit for the TPU's SPMD model, so this rebuild keeps the
same outer structure (rect init, per-side GMMs, 5 refinement rounds) but
replaces the min-cut with checkerboard ICM sweeps over the same energy
(data term = GMM negative log-likelihood, smoothness = contrast-weighted
Potts with gamma=50) — an iterated-conditional-modes relaxation that is
embarrassingly parallel.  Pixels outside the rect stay background, as in
GrabCut's hard constraint.  Output differs from cv2 at ambiguous pixels;
tests assert structural agreement, and the numpy/jnp twins implement the
identical update rule.
"""
from __future__ import annotations

import numpy as np

_K = 5  # color components per side (GrabCut's default)
_GAMMA = 50.0
_OUTER = 5
_ICM_SWEEPS = 2


def _fit_color_model_np(pixels: np.ndarray, k: int, seed: int):
    """k spherical color clusters (means + weights + variance) via Lloyd."""

    from yamimageprocessor_tpu.ops.clustering import kmeans_np

    if len(pixels) < k:
        pixels = np.concatenate([pixels] * (k // max(len(pixels), 1) + 1))[: max(k, 1)]
    labels, centers = kmeans_np(pixels, k, seed, attempts=1, iters=8)
    weights = np.array([(labels == i).mean() for i in range(k)], np.float32) + 1e-6
    var = np.array(
        [
            ((pixels[labels == i] - centers[i]) ** 2).sum(-1).mean()
            if (labels == i).any()
            else 1.0
            for i in range(k)
        ],
        np.float32,
    )
    var = np.maximum(var, 1.0)
    return centers.astype(np.float32), weights, var


def _neg_log_likelihood_np(img: np.ndarray, model) -> np.ndarray:
    centers, weights, var = model
    h, w, _ = img.shape
    d2 = ((img[:, :, None, :] - centers[None, None, :, :]) ** 2).sum(-1)
    log_comp = (
        np.log(weights)[None, None, :]
        - 1.5 * np.log(var)[None, None, :]
        - d2 / (2.0 * var)[None, None, :]
    )
    m = log_comp.max(-1)
    return -(m + np.log(np.exp(log_comp - m[..., None]).sum(-1)))


def grabcut_np(image: np.ndarray, iterations: int = _OUTER, seed: int = 0) -> np.ndarray:
    """Returns the foreground mask (bool)."""

    h, w = image.shape[:2]
    img = image.astype(np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    rect = np.zeros((h, w), bool)
    rect[10 : h - 10, 10 : w - 10] = True
    fg = rect.copy()

    # contrast-weighted smoothness (beta from mean squared neighbor diff)
    diffs = []
    d_r = ((img[:, 1:] - img[:, :-1]) ** 2).sum(-1)
    d_d = ((img[1:, :] - img[:-1, :]) ** 2).sum(-1)
    beta = 1.0 / max(2.0 * np.mean(np.concatenate([d_r.ravel(), d_d.ravel()])), 1e-6)

    for it in range(iterations):
        fg_px = img[fg].reshape(-1, 3)
        bg_px = img[~fg].reshape(-1, 3)
        if len(fg_px) == 0 or len(bg_px) == 0:
            break
        fg_model = _fit_color_model_np(fg_px, _K, seed + it)
        bg_model = _fit_color_model_np(bg_px, _K, seed + it + 100)
        d_fg = _neg_log_likelihood_np(img, fg_model)
        d_bg = _neg_log_likelihood_np(img, bg_model)

        for sweep in range(_ICM_SWEEPS):
            for parity in (0, 1):
                yy, xx = np.mgrid[:h, :w]
                cells = ((yy + xx) % 2) == parity
                # smoothness pull: sum of w * (neighbor is fg) vs bg
                fgf = fg.astype(np.float32)
                pull_fg = np.zeros((h, w), np.float32)
                pull_bg = np.zeros((h, w), np.float32)
                for dy, dx, dw in ((0, 1, d_r), (1, 0, d_d)):
                    wgt = _GAMMA * np.exp(-beta * dw)
                    if dx:
                        pull_fg[:, :-1] += wgt * fgf[:, 1:]
                        pull_bg[:, :-1] += wgt * (1 - fgf[:, 1:])
                        pull_fg[:, 1:] += wgt * fgf[:, :-1]
                        pull_bg[:, 1:] += wgt * (1 - fgf[:, :-1])
                    else:
                        pull_fg[:-1, :] += wgt * fgf[1:, :]
                        pull_bg[:-1, :] += wgt * (1 - fgf[1:, :])
                        pull_fg[1:, :] += wgt * fgf[:-1, :]
                        pull_bg[1:, :] += wgt * (1 - fgf[:-1, :])
                e_fg = d_fg - pull_fg
                e_bg = d_bg - pull_bg
                new_fg = e_fg < e_bg
                fg = np.where(cells, new_fg & rect, fg)
    return fg & rect


def grabcut_mask_image_np(image: np.ndarray, seed: int = 0) -> np.ndarray:
    """image * mask (the reference's result composition, line 243-244)."""

    fg = grabcut_np(image, seed=seed)
    out = image.copy()
    if out.ndim == 2:
        out[~fg] = 0
    else:
        out[~fg] = 0
    return out


__all__ = ["grabcut_np", "grabcut_mask_image_np"]
