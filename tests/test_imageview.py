"""Terminal image rendering + viewport: the PreviewWidget equivalent
(reference ``yam_processor/ui/dialogs.py:171-290, 425-457`` renders images
in a zoom/pan graphics view with background level fetches; here pixels
reach the terminal via kitty/sixel/ASCII and pan/zoom rides the preview
pyramid + region reads)."""
from __future__ import annotations

import base64
import re

import numpy as np
import pytest

from yamimageprocessor_tpu.ui import imageview as IV
from yamimageprocessor_tpu.ui.preview import PreviewRecord


def _gradient(h=64, w=96):
    col = np.linspace(0, 255, w, dtype=np.float64)
    return np.clip(np.rint(np.tile(col, (h, 1))), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# renderers
def test_ascii_halftone_ramp_monotonic():
    lines = IV.ascii_halftone(_gradient(), cols=32, rows=8)
    assert len(lines) == 8 and all(len(line) == 32 for line in lines)
    ramp = IV.ASCII_RAMP
    positions = [ramp.index(ch) for ch in lines[0]]
    assert positions == sorted(positions)  # left->right brighter
    assert positions[0] == 0 and positions[-1] == len(ramp) - 1


def test_ascii_halftone_uniform_frame():
    lines = IV.ascii_halftone(np.full((20, 20), 255, np.uint8), cols=10, rows=5)
    assert set("".join(lines)) == {IV.ASCII_RAMP[-1]}


def test_kitty_stream_roundtrip():
    rgb_bgr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    out = IV.encode_kitty(rgb_bgr, chunk=16)
    assert out.startswith("\x1b_G")
    assert out.endswith("\x1b\\")
    chunks = re.findall(r"\x1b_G([^;]*);([^\x1b]*)\x1b\\\\?", out)
    ctrl0 = chunks[0][0]
    assert "f=24" in ctrl0 and "s=3" in ctrl0 and "v=2" in ctrl0 and "a=T" in ctrl0
    # all non-final chunks carry m=1, final m=0
    flags = [re.search(r"m=(\d)", c[0]).group(1) for c in chunks]
    assert flags[-1] == "0" and all(f == "1" for f in flags[:-1])
    payload = "".join(c[1] for c in chunks)
    decoded = np.frombuffer(base64.standard_b64decode(payload), np.uint8)
    expect = rgb_bgr[..., [2, 1, 0]].ravel()  # stream is RGB, input BGR
    np.testing.assert_array_equal(decoded, expect)


def _decode_sixel(stream: str, h: int, w: int) -> np.ndarray:
    """Minimal sixel decoder for test verification (palette indices)."""

    assert stream.startswith("\x1bPq") and stream.endswith("\x1b\\")
    body = stream[3 : -2]
    body = re.sub(r'^"\d+;\d+;\d+;\d+', "", body)
    palette = {}
    for m in re.finditer(r"#(\d+);2;(\d+);(\d+);(\d+)", body):
        palette[int(m.group(1))] = tuple(int(m.group(i)) for i in (2, 3, 4))
    body = re.sub(r"#\d+;2;\d+;\d+;\d+", "", body)
    out = np.full((h, w), -1, np.int64)
    band = 0
    x = 0
    color = 0
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "#":
            m = re.match(r"#(\d+)", body[i:])
            color = int(m.group(1))
            i += m.end()
            continue
        if ch == "$":
            x = 0
            i += 1
            continue
        if ch == "-":
            band += 1
            x = 0
            i += 1
            continue
        if ch == "!":
            m = re.match(r"!(\d+)(.)", body[i:])
            count = int(m.group(1))
            bits = ord(m.group(2)) - 63
            for _ in range(count):
                for row in range(6):
                    if bits >> row & 1 and band * 6 + row < h and x < w:
                        out[band * 6 + row, x] = color
                x += 1
            i += m.end()
            continue
        bits = ord(ch) - 63
        for row in range(6):
            if bits >> row & 1 and band * 6 + row < h and x < w:
                out[band * 6 + row, x] = color
        x += 1
        i += 1
    return out, palette


def test_sixel_stream_decodes_to_quantized_image():
    img = np.zeros((8, 12, 3), np.uint8)
    img[:4, :6] = (255, 255, 255)  # white block (BGR == RGB here)
    img[4:, 6:] = (0, 0, 255)  # red in BGR
    stream = IV.encode_sixel(img)
    decoded, palette = _decode_sixel(stream, 8, 12)
    assert (decoded >= 0).all()  # every pixel painted exactly once
    # white block brightest palette entry, black block darkest
    white = decoded[0, 0]
    black = decoded[0, 11]
    assert sum(palette[white]) > sum(palette[black])
    red = decoded[7, 11]
    r, g, b = palette[red]
    assert r > g and r > b  # BGR (0,0,255) -> red
    # block uniformity
    assert (decoded[:4, :6] == white).all()
    assert (decoded[4:, 6:] == red).all()


def test_detect_graphics_protocol():
    assert IV.detect_graphics_protocol({"TERM": "xterm-kitty"}) == "kitty"
    assert IV.detect_graphics_protocol({"KITTY_WINDOW_ID": "1"}) == "kitty"
    assert IV.detect_graphics_protocol({"TERM": "xterm-sixel"}) == "sixel"
    assert IV.detect_graphics_protocol({"TERM": "dumb"}) == "ascii"
    assert (
        IV.detect_graphics_protocol({"TERM": "xterm-kitty", "YAM_TERM_GRAPHICS": "ascii"})
        == "ascii"
    )
    assert IV.detect_graphics_protocol({}) == "ascii"


def test_write_png_roundtrip(tmp_path):
    from PIL import Image

    bgr = np.zeros((5, 7, 3), np.uint8)
    bgr[..., 0] = 200  # blue channel in BGR
    IV.write_png(tmp_path / "x.png", bgr)
    back = np.asarray(Image.open(tmp_path / "x.png"))
    assert back.shape == (5, 7, 3)
    assert (back[..., 2] == 200).all() and (back[..., 0] == 0).all()


# ---------------------------------------------------------------------------
# viewport
def test_viewport_fit_and_100(rng):
    img = rng.integers(0, 255, (128, 256), np.uint8)
    vp = IV.ImageViewport(PreviewRecord.build(img))
    fit = vp.view(64, 64)
    assert fit.shape[:2] == (64, 64)
    vp.at_100()
    exact = vp.view(32, 32)
    cy, cx = vp.center
    top, left = int(round(cy - 16)), int(round(cx - 16))
    np.testing.assert_array_equal(exact, img[top : top + 32, left : left + 32])


def test_viewport_pan_clamps(rng):
    img = rng.integers(0, 255, (64, 64), np.uint8)
    vp = IV.ImageViewport(PreviewRecord.build(img))
    vp.at_100()
    for _ in range(50):
        vp.pan(-1.0, -1.0, 16, 16)
    view = vp.view(16, 16)
    np.testing.assert_array_equal(view, img[:16, :16])


class _GigaRecord:
    """16k^2 synthetic source: pixels derive from coordinates, to_array
    raises (reference proof pattern,
    tests/test_pipeline_streaming_large.py:52-108)."""

    def __init__(self, side=16384):
        self.shape = (side, side)
        self.dtype = np.uint8
        self.read_boxes = []

    def infer_shape(self):
        return self.shape

    def read_region(self, box):
        left, top, right, bottom = box
        self.read_boxes.append(tuple(int(v) for v in box))
        rr = np.arange(top, bottom, dtype=np.uint32)[:, None]
        cc = np.arange(left, right, dtype=np.uint32)[None, :]
        return ((rr * 7 + cc * 13) % 251).astype(np.uint8)

    def to_array(self):
        raise AssertionError("gigapixel source must never materialize")


def test_viewport_gigapixel_pans_without_materializing():
    """VERDICT r2 missing #1 'done' criterion: a 16k^2 source displays and
    pans at 100% zoom via region reads only."""

    record = _GigaRecord()
    preview = PreviewRecord.from_tiled(record)
    vp = IV.ImageViewport(preview, record=record)

    vp.at_100()
    record.read_boxes.clear()
    view = vp.view(64, 48)
    # only the visible window was read
    assert all(
        (r - l) <= 80 and (b - t) <= 64 for (l, t, r, b) in record.read_boxes
    )
    boxes = list(record.read_boxes)
    expect = record.read_region((8160, 8168, 8224, 8216))
    record.read_boxes = boxes
    np.testing.assert_array_equal(view, expect)

    vp.pan(0.5, 0.5, 64, 48)
    record.read_boxes.clear()
    vp.view(64, 48)
    assert all(
        (r - l) <= 80 and (b - t) <= 64 for (l, t, r, b) in record.read_boxes
    )


def test_viewport_gigapixel_fit_uses_streamed_level():
    record = _GigaRecord(4096)
    preview = PreviewRecord.from_tiled(record)
    vp = IV.ImageViewport(preview, record=record)
    view = vp.view(32, 32)  # fit: thumbnail-class level, streamed bands
    assert view.shape[:2] == (32, 32)
    # every read was a row band, never the full frame in one call
    assert record.read_boxes, "fit view must come from region reads"
    assert all((b - t) <= 16 for (_, t, _, b) in record.read_boxes)


def test_fit_letterboxes_non_panel_aspect():
    """Fit mode preserves aspect ratio: a wide source in a square panel
    letterboxes (zero bands above/below) instead of stretching (the
    reference PreviewWidget's QGraphicsView fit does the same)."""

    from yamimageprocessor_tpu.ui.imageview import ImageViewport
    from yamimageprocessor_tpu.ui.preview import PreviewRecord

    src = np.full((128, 256), 200, np.uint8)
    vp = ImageViewport(PreviewRecord.build(src))
    vp.fit()
    frame = vp.view(64, 64)
    assert frame.shape[:2] == (64, 64)
    # z = min(64/256, 64/128) = 0.25 -> image occupies 32 rows, centered
    assert (frame[16:48, :] == 200).all()
    assert (frame[:16, :] == 0).all() and (frame[48:, :] == 0).all()


def test_uint16_viewport_normalizes_high_range():
    """uint16 microscopy data must not clip to white in the box-mean path
    (r3 review: clip(0,255)+uint8 cast before normalization)."""

    from yamimageprocessor_tpu.ui.imageview import ImageViewport, _to_rgb
    from yamimageprocessor_tpu.ui.preview import PreviewRecord

    grad = (np.linspace(0, 40000, 128 * 128).reshape(128, 128)).astype(np.uint16)
    vp = ImageViewport(PreviewRecord.build(grad))
    vp.fit()
    frame = vp.view(64, 64)  # 128->64: exact box-mean shrink path
    rgb = _to_rgb(frame) if frame.dtype != np.uint8 else frame
    # a gradient must render as a gradient, not solid white
    assert int(rgb.max()) > 200 and int(rgb.min()) < 50


# ---------------------------------------------------------------------------
# ND slice navigation (PreviewWidget slice controls,
# ref yam_processor/ui/dialogs.py:292-412)
class TestNdSliceNavigation:
    def test_needs_nd_controls(self):
        assert not IV.needs_nd_controls(np.zeros((8, 8), np.uint8))
        assert not IV.needs_nd_controls(np.zeros((8, 8, 3), np.uint8))
        assert not IV.needs_nd_controls(np.zeros((8, 8, 1), np.uint8))
        assert not IV.needs_nd_controls(np.zeros((8, 8, 4), np.uint8))
        assert IV.needs_nd_controls(np.zeros((5, 8, 8), np.uint8))
        assert IV.needs_nd_controls(np.zeros((8, 8, 2), np.uint8))
        assert IV.needs_nd_controls(np.zeros((4, 8, 8, 3), np.uint8))

    def test_axis_qualification(self):
        # singleton axes never qualify; trailing 3-channel of a 3-d array
        # never qualifies; fallback to axis 0 when nothing qualifies
        assert IV.nd_slice_axes((5, 8, 8)) == [0, 1, 2]
        assert IV.nd_slice_axes((1, 8, 8)) == [1, 2]
        assert IV.nd_slice_axes((8, 8, 3)) == [0, 1]
        assert IV.nd_slice_axes((4, 8, 8, 3)) == [0, 1, 2, 3]
        assert IV.nd_slice_axes((1, 1, 1)) == [0]

    def test_extract_nd_slice_upgrades_rank(self):
        stack = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
        plane = IV.extract_nd_slice(stack, 0, 1)
        np.testing.assert_array_equal(plane, stack[1])
        row = IV.extract_nd_slice(stack[:, :, 0], 0, 0)
        assert row.ndim == 2 and row.shape == (1, 3)

    def test_viewport_steps_slices(self):
        stack = np.stack(
            [np.full((16, 24), v, np.uint8) for v in (10, 120, 240)]
        )
        vp = IV.ImageViewport(None, nd_array=stack, dims=("z", "y", "x"))
        assert vp.nd_active and vp.nd_axis == 0 and vp.nd_index == 0
        assert vp.view(24, 16).max() == 10
        vp.step_slice(1)
        assert vp.view(24, 16).max() == 120
        vp.step_slice(10)  # clamps to the last slice
        assert vp.nd_index == 2 and vp.view(24, 16).max() == 240
        vp.step_slice(-10)
        assert vp.nd_index == 0
        assert "z(0) 1/3" in vp.describe(24, 16)

    def test_viewport_cycles_axes_and_clamps_index(self):
        stack = np.arange(4 * 16 * 24, dtype=np.uint8).reshape(4, 16, 24)
        vp = IV.ImageViewport(None, nd_array=stack)
        vp.step_slice(3)
        assert vp.nd_index == 3
        vp.cycle_axis()  # -> axis 1 (rows), index stays 3 (< 16)
        assert vp.nd_axis == 1 and vp.nd_index == 3
        plane = IV.extract_nd_slice(stack, 1, 3)
        assert vp.preview.levels[0].image.shape == plane.shape
        vp.cycle_axis()  # -> axis 2
        vp.cycle_axis()  # wraps -> axis 0; index 3 still valid (4 slices)
        assert vp.nd_axis == 0 and vp.nd_index == 3

    def test_cycle_axis_reclamps_to_short_axis(self):
        stack = np.zeros((16, 2, 24), np.uint8)
        vp = IV.ImageViewport(None, nd_array=stack)
        vp.step_slice(9)
        vp.cycle_axis()  # axis 1 has extent 2: index clamps to 1
        assert vp.nd_axis == 1 and vp.nd_index == 1

    def test_zoom_persists_across_slices_same_shape(self):
        stack = np.zeros((3, 32, 32), np.uint8)
        vp = IV.ImageViewport(None, nd_array=stack)
        vp.at_100()
        vp.step_slice(1)
        assert vp.zoom == 1.0  # same geometry: view transform untouched

    def test_plain_array_via_nd_param_builds_preview(self):
        vp = IV.ImageViewport(None, nd_array=_gradient())
        assert not vp.nd_active
        assert vp.view(32, 32).shape[:2] == (32, 32)
