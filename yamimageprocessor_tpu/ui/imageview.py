"""Terminal image rendering + pan/zoom viewport over preview pyramids.

The reference displays every image in a zoom/pan QGraphicsView with
background level fetches and numpy->QImage conversion
(``/root/reference/yam_processor/ui/dialogs.py:171-290, 425-457``).  The
target environment has no Qt and no display server, so pixels reach the
user through the terminal instead:

* **kitty graphics protocol** (``encode_kitty``) — lossless 24-bit RGB,
  chunked base64 APC stream;
* **sixel** (``encode_sixel``) — DEC SIXEL with an adaptive 64-color
  palette for xterm/mlterm-class emulators;
* **ASCII halftone** (``ascii_halftone``) — luminance ramp fallback that
  renders inside the curses shell itself;
* **PNG export** (``write_png``) — for anything with a real image viewer.

:class:`ImageViewport` maps the viewport to pyramid levels
(``PreviewRecord.best_for`` semantics) or direct ``read_region`` windows,
so a 16k² memmap source pans at full resolution without ever
materializing (mirrors the PreviewWidget contract of background level
fetches + ND slicing without dense frames).
"""
from __future__ import annotations

import base64
import os
from typing import List, Optional, Tuple

import numpy as np

#: luminance ramp, dark -> bright (10 steps like the classic halftone set)
ASCII_RAMP = " .:-=+*#%@"


# ---------------------------------------------------------------------------
# helpers
def _to_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize any preview array to (H, W, 3) uint8 RGB.  3-channel
    inputs are BGR (the pipeline's channel order, reference Loader
    semantics ``core/preprocessing.py:27-39``)."""

    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        lo = float(arr.min()) if arr.size else 0.0
        hi = float(arr.max()) if arr.size else 1.0
        span = (hi - lo) or 1.0
        arr = np.clip((arr.astype(np.float32) - lo) * (255.0 / span), 0, 255)
        arr = arr.astype(np.uint8)
    if arr.ndim == 2:
        return np.repeat(arr[..., None], 3, axis=-1)
    if arr.shape[-1] == 1:
        return np.repeat(arr, 3, axis=-1)
    if arr.shape[-1] >= 3:
        return arr[..., [2, 1, 0]]  # BGR -> RGB
    raise ValueError(f"unsupported image shape {arr.shape}")


def _luminance(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float32)
    g = rgb[..., 1].astype(np.float32)
    b = rgb[..., 2].astype(np.float32)
    return 0.299 * r + 0.587 * g + 0.114 * b


def _box_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-ish resample to (out_h, out_w): box-mean when shrinking,
    nearest when growing — cheap, dependency-free, deterministic."""

    h, w = img.shape[:2]
    out_h = max(1, int(out_h))
    out_w = max(1, int(out_w))
    if out_h <= h and out_w <= w and h % out_h == 0 and w % out_w == 0:
        sh, sw = h // out_h, w // out_w
        view = img[: out_h * sh, : out_w * sw].astype(np.float32)
        view = view.reshape((out_h, sh, out_w, sw) + img.shape[2:])
        pooled = view.mean(axis=(1, 3))
        if img.dtype == np.uint8:
            return np.clip(np.rint(pooled), 0, 255).astype(np.uint8)
        # non-uint8 sources (uint16/float microscopy) keep their range;
        # _to_rgb normalizes at render time — clipping to 0..255 here
        # rendered every high-range image solid white
        return pooled.astype(np.float32)
    ys = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    xs = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# renderers
def ascii_halftone(
    img: np.ndarray, cols: int, rows: int, *, ramp: str = ASCII_RAMP
) -> List[str]:
    """Luminance halftone at ``cols`` x ``rows`` character cells (the
    caller accounts for the ~2:1 cell aspect by its rows/cols choice)."""

    rgb = _to_rgb(img)
    cell = _box_resize(rgb, rows, cols)
    lum = _luminance(cell)
    idx = np.clip(
        (lum * (len(ramp) / 256.0)).astype(np.int64), 0, len(ramp) - 1
    )
    lut = np.array(list(ramp))
    return ["".join(row) for row in lut[idx]]


def encode_kitty(img: np.ndarray, *, chunk: int = 4096) -> str:
    """Kitty graphics protocol stream for a 24-bit RGB frame
    (``f=24,a=T``, chunked base64 with ``m=`` continuation flags)."""

    rgb = np.ascontiguousarray(_to_rgb(img))
    h, w = rgb.shape[:2]
    payload = base64.standard_b64encode(rgb.tobytes()).decode("ascii")
    pieces = [payload[i : i + chunk] for i in range(0, len(payload), chunk)] or [""]
    out = []
    for i, piece in enumerate(pieces):
        ctrl = []
        if i == 0:
            ctrl.append(f"f=24,s={w},v={h},a=T")
        ctrl.append(f"m={1 if i < len(pieces) - 1 else 0}")
        out.append("\x1b_G" + ",".join(ctrl) + ";" + piece + "\x1b\\")
    return "".join(out)


def _quantize_colors(rgb: np.ndarray, levels: Tuple[int, int, int] = (4, 4, 4)):
    """Uniform RGB cube quantization -> (indices (H, W), palette (N, 3)
    in sixel's 0-100 scale)."""

    lr, lg, lb = levels
    r = np.minimum(rgb[..., 0].astype(np.int32) * lr // 256, lr - 1)
    g = np.minimum(rgb[..., 1].astype(np.int32) * lg // 256, lg - 1)
    b = np.minimum(rgb[..., 2].astype(np.int32) * lb // 256, lb - 1)
    idx = (r * lg + g) * lb + b
    rr, gg, bb = np.meshgrid(
        np.arange(lr), np.arange(lg), np.arange(lb), indexing="ij"
    )

    def centers(vals, n):
        return ((vals + 0.5) * (100.0 / n)).round().astype(np.int32)

    palette = np.stack(
        [centers(rr, lr).ravel(), centers(gg, lg).ravel(), centers(bb, lb).ravel()],
        axis=1,
    )
    return idx, palette


def encode_sixel(img: np.ndarray) -> str:
    """DEC SIXEL stream with a 64-color uniform palette.

    Structure: DCS ``\\x1bPq`` + ``#<i>;2;R;G;B`` palette defs + per-band
    per-color sixel runs + ``\\x1b\\\\`` terminator.
    """

    rgb = _to_rgb(img)
    h, w = rgb.shape[:2]
    idx, palette = _quantize_colors(rgb)
    parts = ["\x1bPq", f'"1;1;{w};{h}']
    for i, (r, g, b) in enumerate(palette):
        parts.append(f"#{i};2;{r};{g};{b}")
    for top in range(0, h, 6):
        band = idx[top : top + 6]
        rows = band.shape[0]
        band_used = np.unique(band)
        first = True
        for color in band_used:
            mask = band == color
            bits = np.zeros(w, np.int32)
            for row in range(rows):
                bits |= mask[row].astype(np.int32) << row
            chars = (bits + 63).astype(np.uint8).tobytes().decode("latin-1")
            # run-length compress
            out = []
            run_char = chars[0]
            run_len = 1
            for ch in chars[1:]:
                if ch == run_char:
                    run_len += 1
                    continue
                out.append(f"!{run_len}{run_char}" if run_len > 3 else run_char * run_len)
                run_char, run_len = ch, 1
            out.append(f"!{run_len}{run_char}" if run_len > 3 else run_char * run_len)
            if not first:
                parts.append("$")  # carriage return within the band
            parts.append(f"#{color}" + "".join(out))
            first = False
        parts.append("-")  # next band
    parts.append("\x1b\\")
    return "".join(parts)


def detect_graphics_protocol(env: Optional[dict] = None) -> str:
    """'kitty' | 'sixel' | 'ascii' from the environment (no tty queries —
    the shell must stay scriptable/headless)."""

    env = os.environ if env is None else env
    override = env.get("YAM_TERM_GRAPHICS", "").lower()
    if override in ("kitty", "sixel", "ascii"):
        return override
    term = env.get("TERM", "")
    if env.get("KITTY_WINDOW_ID") or "kitty" in term or "ghostty" in term:
        return "kitty"
    if "sixel" in term or env.get("MLTERM") or term.startswith("yaft"):
        return "sixel"
    return "ascii"


def write_png(path, img: np.ndarray) -> None:
    """Preview-to-PNG export (RGB; Pillow codec as in io/image_io)."""

    from PIL import Image

    Image.fromarray(_to_rgb(img), mode="RGB").save(str(path), format="PNG")


# ---------------------------------------------------------------------------
# ND slice navigation (PreviewWidget slice controls,
# ref yam_processor/ui/dialogs.py:292-412)
def needs_nd_controls(array) -> bool:
    """True when an array browses as an ND stack rather than one frame:
    ndim > 2, except a 2-D image with a trailing 1/3/4 channel axis
    (``_should_use_nd_controls``, ref dialogs.py:317-322)."""

    ndim = getattr(array, "ndim", 0)
    if ndim <= 2:
        return False
    if ndim == 3 and array.shape[2] in (1, 3, 4):
        return False
    return True


def nd_slice_axes(shape: Tuple[int, ...]) -> List[int]:
    """Qualifying browse axes: every axis of extent > 1, minus a 3-d
    array's trailing channel axis of size 1/3/4; axis 0 as the fallback
    when nothing qualifies (``_configure_slice_controls``,
    ref dialogs.py:324-341)."""

    ndim = len(shape)
    axes = [
        i
        for i, size in enumerate(shape)
        if size > 1 and not (ndim == 3 and i == ndim - 1 and size in (1, 3, 4))
    ]
    return axes or [0]


def extract_nd_slice(array: np.ndarray, axis: int, index: int) -> np.ndarray:
    """One displayable plane of an ND stack; 0-d/1-d results upgrade to
    2-D exactly like the reference (``_render_nd_slice``,
    ref dialogs.py:377-390)."""

    selector = [slice(None)] * array.ndim
    selector[axis] = index
    plane = np.asarray(array[tuple(selector)])
    if plane.ndim == 0:
        plane = plane.reshape(1, 1)
    elif plane.ndim == 1:
        plane = plane[None, :]
    return plane


# ---------------------------------------------------------------------------
# viewport
class ImageViewport:
    """Pan/zoom window over a :class:`~yamimageprocessor_tpu.ui.preview.
    PreviewRecord` pyramid, with direct ``read_region`` windows at fine
    zooms so gigapixel sources never materialize.

    ``zoom`` = display pixels per source pixel (1.0 = 100%).  The level
    choice mirrors ``PreviewRecord.best_for``: the coarsest pyramid level
    that still covers the requested display resolution; levels too large
    to materialize are replaced by windowed region reads.
    """

    #: a pyramid level only materializes on this path when its full frame
    #: stays modest (thumbnail-class); larger demands go to read_region
    MAX_LEVEL_EDGE = 2048

    def __init__(self, preview, record=None, nd_array=None, dims=None) -> None:
        self.record = record
        self.nd_array = None
        self.nd_dims: Tuple[str, ...] = ()
        self.nd_axes: List[int] = []
        self.nd_axis = 0
        self.nd_index = 0
        if nd_array is not None and needs_nd_controls(nd_array):
            # ND stack: the viewport owns per-slice pyramids; zoom/center
            # persist across slice steps (the reference swaps the pixmap
            # under an unchanged QGraphicsView transform)
            self.nd_array = np.asarray(nd_array)
            self.nd_dims = (
                tuple(str(d) for d in dims)
                if dims
                else tuple(f"Axis {i}" for i in range(self.nd_array.ndim))
            )
            self.nd_axes = nd_slice_axes(self.nd_array.shape)
            self.nd_axis = self.nd_axes[0]
            self.nd_index = 0
            preview = self._slice_preview()
        elif nd_array is not None:
            from yamimageprocessor_tpu.ui.preview import PreviewRecord

            preview = PreviewRecord.build(np.asarray(nd_array))
        self.preview = preview
        shape = preview.levels[0].shape
        self.src_h = int(shape[0])
        self.src_w = int(shape[1])
        self.center = (self.src_h / 2.0, self.src_w / 2.0)
        self.zoom: Optional[float] = None  # None = fit

    # -- ND slice browsing ------------------------------------------------
    def _slice_preview(self):
        from yamimageprocessor_tpu.ui.preview import PreviewRecord

        return PreviewRecord.build(
            extract_nd_slice(self.nd_array, self.nd_axis, self.nd_index)
        )

    @property
    def nd_active(self) -> bool:
        return self.nd_array is not None

    def _reslice(self) -> None:
        self.preview = self._slice_preview()
        shape = self.preview.levels[0].shape
        src = (int(shape[0]), int(shape[1]))
        if src != (self.src_h, self.src_w):
            self.src_h, self.src_w = src
            self.fit()

    def cycle_axis(self) -> None:
        """Advance to the next qualifying axis; the slice index clamps to
        the new extent (``_update_slice_range``, ref dialogs.py:355-365)."""

        if not self.nd_active or len(self.nd_axes) < 2:
            return
        pos = self.nd_axes.index(self.nd_axis)
        self.nd_axis = self.nd_axes[(pos + 1) % len(self.nd_axes)]
        self.nd_index = min(self.nd_index, self.nd_array.shape[self.nd_axis] - 1)
        self._reslice()

    def step_slice(self, delta: int) -> None:
        if not self.nd_active:
            return
        size = self.nd_array.shape[self.nd_axis]
        index = int(np.clip(self.nd_index + delta, 0, size - 1))
        if index != self.nd_index:
            self.nd_index = index
            self._reslice()

    def nd_status(self) -> str:
        if not self.nd_active:
            return ""
        name = self.nd_dims[self.nd_axis]
        size = self.nd_array.shape[self.nd_axis]
        return f"{name}({self.nd_axis}) {self.nd_index + 1}/{size}"

    # -- state ----------------------------------------------------------
    def fit(self) -> None:
        self.zoom = None
        self.center = (self.src_h / 2.0, self.src_w / 2.0)

    def at_100(self) -> None:
        self.zoom = 1.0

    def zoom_by(self, factor: float, vw: int = 512, vh: int = 512) -> None:
        z = self.zoom if self.zoom is not None else self._fit_zoom(vw, vh)
        self.zoom = float(np.clip(z * factor, 1e-6, 64.0))

    def pan(self, drow: float, dcol: float, vw: int = 512, vh: int = 512) -> None:
        """Pan by a fraction of the visible window (keyboard semantics)."""

        z = self.zoom if self.zoom is not None else self._fit_zoom(vw, vh)
        cy, cx = self.center
        self.center = (cy + drow * (vh / z), cx + dcol * (vw / z))

    def _fit_zoom(self, vw: int, vh: int) -> float:
        return min(vw / self.src_w, vh / self.src_h)

    def describe(self, vw: int = 512, vh: int = 512) -> str:
        z = self.zoom if self.zoom is not None else self._fit_zoom(vw, vh)
        cy, cx = self.center
        mode = "fit" if self.zoom is None else f"{z * 100:.0f}%"
        base = f"zoom {mode} @({cy:.0f},{cx:.0f}) src {self.src_h}x{self.src_w}"
        nd = self.nd_status()
        return f"{base} slice {nd}" if nd else base

    # -- rendering ------------------------------------------------------
    def view(self, vw: int, vh: int) -> np.ndarray:
        """The (vh, vw) display window as uint8 (source dtype normalized)."""

        z = self.zoom if self.zoom is not None else self._fit_zoom(vw, vh)
        sw = min(self.src_w, max(1, int(np.ceil(vw / z))))
        sh = min(self.src_h, max(1, int(np.ceil(vh / z))))
        cy = float(np.clip(self.center[0], sh / 2.0, self.src_h - sh / 2.0))
        cx = float(np.clip(self.center[1], sw / 2.0, self.src_w - sw / 2.0))
        self.center = (cy, cx)
        top = int(round(cy - sh / 2.0))
        left = int(round(cx - sw / 2.0))
        top = max(0, min(top, self.src_h - sh))
        left = max(0, min(left, self.src_w - sw))

        step = 1
        while step * 2 <= max(1, int(1.0 / z)):
            step *= 2

        window = self._fetch_window(left, top, left + sw, top + sh, step)
        # aspect-preserving target + letterbox: the source window maps onto
        # round(sh*z) x round(sw*z) display pixels; stretching it to the
        # full panel would distort any non-panel-aspect image (the
        # reference PreviewWidget's QGraphicsView fit letterboxes too)
        th = min(vh, max(1, int(round(sh * z))))
        tw = min(vw, max(1, int(round(sw * z))))
        img = _box_resize(window, th, tw)
        if (th, tw) == (vh, vw):
            return img
        canvas = np.zeros((vh, vw) + img.shape[2:], img.dtype)
        y0 = (vh - th) // 2
        x0 = (vw - tw) // 2
        canvas[y0 : y0 + th, x0 : x0 + tw, ...] = img
        return canvas

    def _fetch_window(
        self, left: int, top: int, right: int, bottom: int, step: int
    ) -> np.ndarray:
        # prefer a pyramid level at (or below) the wanted step if it is
        # already materialized or cheap to materialize
        best = None
        for level in self.preview.levels:
            if level.scale > step:
                continue
            cheap = level.materialized or max(level.shape[:2]) <= self.MAX_LEVEL_EDGE
            if cheap and (best is None or level.scale > best.scale):
                best = level
        if best is not None and (best.scale > 1 or self.record is None):
            s = best.scale
            img = best.image
            return img[top // s : max(top // s + 1, bottom // s),
                       left // s : max(left // s + 1, right // s), ...]
        if self.record is None:
            return self.preview.levels[0].image[top:bottom, left:right, ...]
        # windowed region read (never to_array); band-read + pool when a
        # coarse step would otherwise pull step^2 x the display pixels
        if step <= 2:
            region = np.asarray(
                self.record.read_region((left, top, right, bottom))
            )
            return region[:: step, :: step, ...] if step > 1 else region
        out_rows = max(1, (bottom - top) // step)
        out_cols = max(1, (right - left) // step)
        rows = []
        for orow in range(out_rows):
            btop = top + orow * step
            band = np.asarray(
                self.record.read_region((left, btop, right, min(btop + step, bottom)))
            )
            band = band[:, : out_cols * step, ...].astype(np.float32)
            pooled = band.reshape(
                (band.shape[0], out_cols, step) + band.shape[3:]
                if band.ndim == 2
                else (band.shape[0], out_cols, step) + band.shape[2:]
            ).mean(axis=(0, 2))
            rows.append(pooled)
        out = np.stack(rows)
        if np.dtype(getattr(self.record, "dtype", np.uint8) or np.uint8) == np.uint8:
            return np.clip(np.rint(out), 0, 255).astype(np.uint8)
        return out.astype(np.float32)  # _to_rgb normalizes high-range data


__all__ = [
    "ASCII_RAMP",
    "ascii_halftone",
    "encode_kitty",
    "encode_sixel",
    "detect_graphics_protocol",
    "write_png",
    "ImageViewport",
    "needs_nd_controls",
    "nd_slice_axes",
    "extract_nd_slice",
]
