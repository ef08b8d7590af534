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


def _fit_color_model_j(pixels, weights, k: int, seed: int):
    """Device twin of :func:`_fit_color_model_np` on FIXED shapes: a weighted
    Lloyd over ALL pixels with 0/1 ``weights`` replaces the dynamic-shape
    subset fit (XLA needs static shapes), so the device fit is semantically
    equivalent but not bit-identical to the host's subset fit."""

    import jax.numpy as jnp

    from yamimageprocessor_tpu.ops.clustering import kmeans_init_uniform

    u = jnp.asarray(kmeans_init_uniform(k, 3, seed, 1)[0])
    big = jnp.float32(3.4e38)
    wcol = weights[:, None]
    lo = jnp.min(jnp.where(wcol > 0, pixels, big), axis=0)
    hi = jnp.max(jnp.where(wcol > 0, pixels, -big), axis=0)
    centers = lo + u * (hi - lo)
    total = jnp.maximum(weights.sum(), 1.0)

    for _ in range(8):
        d2 = ((pixels[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = jnp.argmin(d2, axis=1)
        oh = (assign[:, None] == jnp.arange(k)[None]).astype(jnp.float32) * wcol
        counts = oh.sum(0)
        sums = oh.T @ pixels
        centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers
        )

    d2 = ((pixels[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    assign = jnp.argmin(d2, axis=1)
    oh = (assign[:, None] == jnp.arange(k)[None]).astype(jnp.float32) * wcol
    counts = oh.sum(0)
    wk = counts / total + 1e-6
    sq = (oh * d2).sum(0)
    var = jnp.maximum(jnp.where(counts > 0, sq / jnp.maximum(counts, 1.0), 1.0), 1.0)
    return centers, wk, var


def _neg_log_likelihood_j(img, model):
    import jax.numpy as jnp

    centers, weights, var = model
    d2 = ((img[:, :, None, :] - centers[None, None, :, :]) ** 2).sum(-1)
    log_comp = (
        jnp.log(weights)[None, None, :]
        - 1.5 * jnp.log(var)[None, None, :]
        - d2 / (2.0 * var)[None, None, :]
    )
    m = log_comp.max(-1)
    return -(m + jnp.log(jnp.exp(log_comp - m[..., None]).sum(-1)))


def grabcut_j(image, iterations: int = _OUTER, seed: int = 0):
    """Jittable foreground mask (bool), same outer structure and ICM update
    rule as :func:`grabcut_np`; the color models are the weighted fixed-shape
    fit above, so masks agree structurally rather than bit-for-bit."""

    import jax.numpy as jnp

    h, w = image.shape[:2]
    img = image.astype(jnp.float32)
    if img.ndim == 2:
        img = jnp.repeat(img[..., None], 3, axis=-1)
    yy, xx = jnp.mgrid[:h, :w]
    rect = (yy >= 10) & (yy < h - 10) & (xx >= 10) & (xx < w - 10)
    fg = rect

    d_r = ((img[:, 1:] - img[:, :-1]) ** 2).sum(-1)
    d_d = ((img[1:, :] - img[:-1, :]) ** 2).sum(-1)
    beta = 1.0 / jnp.maximum(
        2.0 * jnp.concatenate([d_r.reshape(-1), d_d.reshape(-1)]).mean(), 1e-6
    )
    w_r = _GAMMA * jnp.exp(-beta * d_r)
    w_d = _GAMMA * jnp.exp(-beta * d_d)
    pixels = img.reshape(-1, 3)
    parity_cells = ((yy + xx) % 2).astype(jnp.int32)

    for it in range(iterations):
        wfg = fg.reshape(-1).astype(jnp.float32)
        fg_model = _fit_color_model_j(pixels, wfg, _K, seed + it)
        bg_model = _fit_color_model_j(pixels, 1.0 - wfg, _K, seed + it + 100)
        d_fg = _neg_log_likelihood_j(img, fg_model)
        d_bg = _neg_log_likelihood_j(img, bg_model)

        for _sweep in range(_ICM_SWEEPS):
            for parity in (0, 1):
                cells = parity_cells == parity
                fgf = fg.astype(jnp.float32)
                pull_fg = jnp.zeros((h, w), jnp.float32)
                pull_bg = jnp.zeros((h, w), jnp.float32)
                pull_fg = pull_fg.at[:, :-1].add(w_r * fgf[:, 1:])
                pull_bg = pull_bg.at[:, :-1].add(w_r * (1 - fgf[:, 1:]))
                pull_fg = pull_fg.at[:, 1:].add(w_r * fgf[:, :-1])
                pull_bg = pull_bg.at[:, 1:].add(w_r * (1 - fgf[:, :-1]))
                pull_fg = pull_fg.at[:-1, :].add(w_d * fgf[1:, :])
                pull_bg = pull_bg.at[:-1, :].add(w_d * (1 - fgf[1:, :]))
                pull_fg = pull_fg.at[1:, :].add(w_d * fgf[:-1, :])
                pull_bg = pull_bg.at[1:, :].add(w_d * (1 - fgf[:-1, :]))
                new_fg = (d_fg - pull_fg) < (d_bg - pull_bg)
                fg = jnp.where(cells, new_fg & rect, fg)
    return fg & rect


def grabcut_mask_image_j(image, seed: int = 0):
    import jax.numpy as jnp

    fg = grabcut_j(image, seed=seed)
    if image.ndim == 2:
        return jnp.where(fg, image, 0)
    return jnp.where(fg[..., None], image, 0)


__all__ = [
    "grabcut_np",
    "grabcut_mask_image_np",
    "grabcut_j",
    "grabcut_mask_image_j",
]
