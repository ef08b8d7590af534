"""Codec round-trips: rasters, numpy, HDF5, TIFF stacks, lazy records
(models the reference's tests/test_image_io.py)."""
from __future__ import annotations

import numpy as np
import pytest

from yamimageprocessor_tpu.io import image_io
from yamimageprocessor_tpu.io.image_io import (
    DimensionalImageRecord,
    ImageRecord,
    TiledImageRecord,
    UnsupportedFormatError,
    should_stream,
)


@pytest.fixture()
def bgr(rng):
    return rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)


@pytest.fixture()
def gray(rng):
    return rng.integers(0, 256, (32, 48), dtype=np.uint8)


@pytest.mark.parametrize("suffix", [".png", ".bmp", ".tif"])
def test_raster_roundtrip_color(tmp_path, bgr, suffix):
    path = tmp_path / f"img{suffix}"
    image_io.save_image(path, bgr)
    record = image_io.load_image(path, lazy=False)
    assert isinstance(record, ImageRecord)
    assert (record.to_array() == bgr).all()


def test_jpeg_is_lossy_but_close(tmp_path, gray):
    path = tmp_path / "img.jpg"
    image_io.save_image(path, gray, quality=95)
    record = image_io.load_image(path, lazy=False)
    assert np.abs(record.to_array().astype(int) - gray.astype(int)).mean() < 8


def test_npy_roundtrip_and_lazy(tmp_path, gray):
    path = tmp_path / "img.npy"
    image_io.save_image(path, gray)
    eager = image_io.load_image(path, lazy=False)
    assert (eager.to_array() == gray).all()
    lazy = image_io.load_image(path, lazy=True)
    assert isinstance(lazy, TiledImageRecord)
    assert (lazy.read_region((4, 2, 12, 10)) == gray[2:10, 4:12]).all()


def test_npz_with_dims_and_coords(tmp_path):
    data = np.random.default_rng(0).random((3, 8, 9)).astype(np.float32)
    record = DimensionalImageRecord(
        data=data,
        dims=("z", "y", "x"),
        coordinates={"z": np.array([0.0, 0.5, 1.0])},
    )
    path = tmp_path / "stack.npz"
    image_io.save_image(path, record)
    loaded = image_io.load_image(path)
    assert isinstance(loaded, DimensionalImageRecord)
    assert loaded.dims == ("z", "y", "x")
    np.testing.assert_allclose(loaded.coordinates["z"], [0.0, 0.5, 1.0])
    np.testing.assert_allclose(loaded.to_array(), data)


def test_hdf5_roundtrip(tmp_path):
    data = np.random.default_rng(1).random((4, 6, 5)).astype(np.float32)
    record = DimensionalImageRecord(
        data=data, dims=("t", "y", "x"), coordinates={"t": np.arange(4.0)}
    )
    path = tmp_path / "vol.h5"
    image_io.save_image(path, record)
    loaded = image_io.load_image(path)
    assert isinstance(loaded, DimensionalImageRecord)
    assert loaded.dims == ("t", "y", "x")
    np.testing.assert_allclose(loaded.to_array(), data)


def test_tiff_stack_roundtrip(tmp_path, rng):
    stack = rng.integers(0, 255, (5, 16, 20), dtype=np.uint8)
    path = tmp_path / "stack.tiff"
    image_io.save_image(path, stack)
    loaded = image_io.load_image(path)
    assert isinstance(loaded, DimensionalImageRecord)
    assert loaded.to_array().shape == (5, 16, 20)
    assert (loaded.to_array() == stack).all()


def test_lazy_threshold_decision():
    assert not should_stream((1000, 1000))
    assert should_stream((9000, 9000))


def test_unknown_format(tmp_path, gray):
    with pytest.raises(UnsupportedFormatError):
        image_io.save_image(tmp_path / "img.xyz", gray)
    (tmp_path / "odd.xyz").write_bytes(b"data")
    with pytest.raises(UnsupportedFormatError):
        image_io.load_image(tmp_path / "odd.xyz")


def test_lazy_raster_tiles(tmp_path, bgr, monkeypatch):
    path = tmp_path / "img.png"
    image_io.save_image(path, bgr)
    monkeypatch.setattr(image_io, "LAZY_PIXEL_THRESHOLD", 100)
    record = image_io.load_image(path, lazy="auto")
    assert isinstance(record, TiledImageRecord)
    tiles = list(record.iter_tiles((16, 16)))
    assert tiles[0][0] == (0, 0, 16, 16)
    assert (tiles[0][1] == bgr[:16, :16]).all()
    record.close()


def _synthetic_volume(width, height, channels):
    # smooth float field so tile reassembly errors are visible
    # (models tests/test_io_manager_streaming.py:30-37 fixtures)
    y = np.linspace(0, 1, height, dtype=np.float32)[:, None]
    x = np.linspace(0, 1, width, dtype=np.float32)[None, :]
    base = (np.sin(x * np.pi) + np.cos(y * np.pi)) * 128.0
    if channels == 1:
        return base.astype(np.float32)
    return np.stack([base + 5.0 * i for i in range(channels)], axis=-1).astype(
        np.float32
    )


def test_lazy_memmap_streams_without_materialising(tmp_path):
    """Full tile sweep over a lazy float32 volume never densifies the record
    and covers every pixel exactly once (tests/test_io_manager_streaming.py:40-67)."""
    array = _synthetic_volume(width=960, height=640, channels=3)
    path = tmp_path / "large.npy"
    np.save(path, array, allow_pickle=False)

    record = image_io.load_image(path, lazy=True)
    assert isinstance(record, TiledImageRecord)

    tile_size = (160, 128)  # (width, height), non-divisible remainders on both axes
    assembled = np.zeros_like(array)
    tiles_seen = 0
    for box, tile in record.iter_tiles(tile_size):
        left, top, right, bottom = box
        np.testing.assert_array_equal(tile, array[top:bottom, left:right])
        assembled[top:bottom, left:right] = tile
        tiles_seen += 1
    np.testing.assert_array_equal(assembled, array)
    assert tiles_seen == ((640 + 127) // 128) * ((960 + 159) // 160)
    assert record._cached is None  # streaming never materialized the frame
    record.close()


def test_lazy_memmap_read_region_matches_source(tmp_path):
    """Arbitrary interior regions of a 2-channel lazy record match the array
    (tests/test_io_manager_streaming.py:70-92)."""
    array = _synthetic_volume(width=512, height=768, channels=2)
    path = tmp_path / "regions.npy"
    np.save(path, array, allow_pickle=False)

    record = image_io.load_image(path, lazy=True)
    assert isinstance(record, TiledImageRecord)
    for box in [(0, 0, 128, 128), (100, 50, 260, 190), (256, 512, 512, 768)]:
        left, top, right, bottom = box
        np.testing.assert_array_equal(
            record.read_region(box), array[top:bottom, left:right]
        )
    assert record._cached is None
    record.close()


def test_device_executor(rng):
    from yamimageprocessor_tpu.ops.schema import Stage
    from yamimageprocessor_tpu.parallel.executor import DeviceExecutor
    from yamimageprocessor_tpu.pipeline.manager import PipelineManager
    from yamimageprocessor_tpu.pipeline.step import (
        PipelineStep,
        StepExecutionMetadata,
    )

    image = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    step = PipelineStep(
        name="Gamma",
        stage=Stage.PREPROCESSING,
        params={"value": 2.0},
        execution=StepExecutionMetadata(requires_gpu=True),
    )
    manager = PipelineManager([step], gpu_executor=DeviceExecutor())
    out = manager.apply(image)
    expected = step.impl.golden_fn(image, value=2.0)
    assert (out == expected).all()


def test_tiff_colour_stack_round_trip(tmp_path, rng):
    """(F, H, W, 3) colour stacks must save as F colour planes with the
    BGR->RGB swap (r3 review: shape[-2:] flattened frame+height and wrote
    (W, 3) grayscale garbage)."""

    stack = rng.integers(0, 255, (3, 16, 20, 3), dtype=np.uint8)
    target = tmp_path / "stack.tiff"
    image_io.save_image(target, stack)
    loaded = np.asarray(image_io.load_image(target).to_array())
    assert loaded.shape == stack.shape
    assert (loaded == stack).all()
