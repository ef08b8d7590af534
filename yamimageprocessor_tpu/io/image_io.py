"""Image codecs and records: eager, streaming and N-dimensional.

Capability parity with ``yam_processor/data/image_io.py:52-487``:

* :class:`ImageRecord` — eager pixels + metadata (EXIF/ICC carried through
  for raster formats);
* :class:`TiledImageRecord` — lazy streaming handle (Pillow / memmap), from
  :mod:`yamimageprocessor_tpu.io.tiled_image`;
* :class:`DimensionalImageRecord` — ND data + named dims + per-axis
  coordinates (HDF5 attributes round-trip);
* ``load_image`` / ``save_image`` over PNG/JPEG/TIFF/BMP (Pillow),
  NPY/NPZ (numpy, memmap-lazy) and HDF5 (h5py, gated);
* lazy threshold: frames above ``YAM_LAZY_PIXEL_THRESHOLD`` (64 MP default)
  stream instead of materializing; TIFF stacks load as ND records.

Wire convention: channel-last BGR uint8, matching the reference.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from yamimageprocessor_tpu.io.tiled_image import TiledImageRecord, rgb_to_bgr

LAZY_PIXEL_THRESHOLD = int(
    os.environ.get("YAM_LAZY_PIXEL_THRESHOLD", 64 * 1024 * 1024)
)

RASTER_SUFFIXES = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff"}
NUMPY_SUFFIXES = {".npy", ".npz"}
HDF5_SUFFIXES = {".h5", ".hdf5"}


class UnsupportedFormatError(ValueError):
    """Raised for unknown image suffixes."""


@dataclass
class ImageRecord:
    """Eager image: dense pixels + metadata."""

    pixels: np.ndarray
    metadata: Dict[str, Any] = field(default_factory=dict)
    path: Optional[Path] = None
    exif: Optional[bytes] = None
    icc_profile: Optional[bytes] = None

    def to_array(self) -> np.ndarray:
        return self.pixels

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.pixels.shape)

    @property
    def dtype(self) -> np.dtype:
        return self.pixels.dtype


@dataclass
class DimensionalImageRecord:
    """N-dimensional data with named dims and optional coordinates."""

    data: np.ndarray
    dims: Tuple[str, ...] = ()
    coordinates: Dict[str, np.ndarray] = field(default_factory=dict)
    metadata: Dict[str, Any] = field(default_factory=dict)
    path: Optional[Path] = None

    def __post_init__(self) -> None:
        if not self.dims:
            self.dims = tuple(f"dim_{i}" for i in range(self.data.ndim))
        if len(self.dims) != self.data.ndim:
            raise ValueError("dims must name every data axis")

    def to_array(self) -> np.ndarray:
        return self.data

    @property
    def shape(self) -> Tuple[int, ...]:
        return tuple(self.data.shape)

    @property
    def dtype(self) -> np.dtype:
        return self.data.dtype


AnyRecord = Union[ImageRecord, TiledImageRecord, DimensionalImageRecord]


def should_stream(shape: Sequence[int]) -> bool:
    """Lazy decision (``image_io.py:466-487``): stream above the pixel
    threshold."""

    pixels = 1
    for dim in shape[:2]:
        pixels *= int(dim)
    return pixels > LAZY_PIXEL_THRESHOLD


# ---------------------------------------------------------------------------
# loading
def load_image(
    path: os.PathLike[str] | str,
    *,
    lazy: Union[bool, str] = "auto",
    metadata: Optional[Dict[str, Any]] = None,
) -> AnyRecord:
    source = Path(path)
    suffix = source.suffix.lower()
    meta = dict(metadata or {})
    if suffix in NUMPY_SUFFIXES:
        return _load_numpy(source, lazy, meta)
    if suffix in HDF5_SUFFIXES:
        return _load_hdf5(source, meta)
    if suffix in RASTER_SUFFIXES:
        return _load_raster(source, lazy, meta)
    raise UnsupportedFormatError(f"Unsupported image format: {suffix}")


def _load_raster(path: Path, lazy, meta) -> AnyRecord:
    from PIL import Image

    image = Image.open(path)
    n_frames = getattr(image, "n_frames", 1)
    if n_frames > 1:  # TIFF stack -> ND record
        frames = []
        for index in range(n_frames):
            image.seek(index)
            frames.append(rgb_to_bgr(np.array(image)))
        image.close()
        data = np.stack(frames, axis=0)
        dims = ("frame", "y", "x") + (("channel",) if data.ndim == 4 else ())
        return DimensionalImageRecord(data=data, dims=dims, metadata=meta, path=path)

    width, height = image.size
    stream = lazy is True or (lazy == "auto" and should_stream((height, width)))
    if stream:
        return TiledImageRecord.from_raster(path, metadata=meta, image=image)
    array = np.array(image)
    exif = image.info.get("exif")
    icc = image.info.get("icc_profile")
    if image.mode not in {"F", "I;16"}:
        array = rgb_to_bgr(array)
    image.close()
    return ImageRecord(
        pixels=np.ascontiguousarray(array),
        metadata=meta,
        path=path,
        exif=exif,
        icc_profile=icc,
    )


def _load_numpy(path: Path, lazy, meta) -> AnyRecord:
    if path.suffix.lower() == ".npz":
        with np.load(path, allow_pickle=False) as data:
            key = "image" if "image" in data.files else data.files[0]
            array = np.array(data[key])
            dims_attr = data["dims"] if "dims" in data.files else None
            coords = {
                name[len("coord_") :]: np.array(data[name])
                for name in data.files
                if name.startswith("coord_")
            }
            if "metadata_json" in data.files:
                try:
                    embedded = json.loads(str(data["metadata_json"]))
                    if isinstance(embedded, dict):
                        meta = {**embedded, **meta}
                except (json.JSONDecodeError, TypeError):
                    pass
        if dims_attr is not None or coords or array.ndim > 3:
            dims = (
                tuple(str(d) for d in dims_attr) if dims_attr is not None else ()
            )
            return DimensionalImageRecord(
                data=array, dims=dims, coordinates=coords, metadata=meta, path=path
            )
        return ImageRecord(pixels=array, metadata=meta, path=path)

    mm = np.load(path, mmap_mode="r", allow_pickle=False)
    stream = lazy is True or (lazy == "auto" and should_stream(mm.shape))
    if stream and mm.ndim >= 2:
        return TiledImageRecord.from_npy(path, metadata=meta, memmap=mm)
    return ImageRecord(pixels=np.array(mm), metadata=meta, path=path)


def _load_hdf5(path: Path, meta) -> AnyRecord:
    try:
        import h5py
    except ImportError as exc:  # pragma: no cover - h5py is present here
        raise UnsupportedFormatError("HDF5 support requires h5py") from exc
    with h5py.File(path, "r") as handle:
        key = "image" if "image" in handle else next(iter(handle.keys()))
        dataset = handle[key]
        array = np.array(dataset)
        dims = tuple(
            str(d) for d in dataset.attrs.get("dims", ())
        ) or tuple(f"dim_{i}" for i in range(array.ndim))
        coords = {}
        for name, value in dataset.attrs.items():
            if str(name).startswith("coord_"):
                coords[str(name)[len("coord_") :]] = np.array(value)
    is_plain_frame = array.ndim == 2 or (
        array.ndim == 3 and array.shape[-1] in (3, 4)
    )
    if coords or not is_plain_frame:
        return DimensionalImageRecord(
            data=array, dims=dims, coordinates=coords, metadata=meta, path=path
        )
    return ImageRecord(pixels=array, metadata=meta, path=path)


# ---------------------------------------------------------------------------
# saving
def save_image(
    path: os.PathLike[str] | str,
    image: Union[np.ndarray, AnyRecord],
    *,
    metadata: Optional[Dict[str, Any]] = None,
    quality: Optional[int] = None,
) -> Path:
    target = Path(path)
    suffix = target.suffix.lower()
    record = _as_record(image, metadata)

    if suffix in NUMPY_SUFFIXES:
        _save_numpy(target, record)
    elif suffix in HDF5_SUFFIXES:
        _save_hdf5(target, record)
    elif suffix in RASTER_SUFFIXES:
        _save_raster(target, record, quality)
    else:
        raise UnsupportedFormatError(f"Unsupported image format: {suffix}")
    return target


def _as_record(image, metadata) -> AnyRecord:
    if isinstance(image, (ImageRecord, DimensionalImageRecord, TiledImageRecord)):
        if metadata:
            image.metadata.update(metadata)
        return image
    return ImageRecord(pixels=np.asarray(image), metadata=dict(metadata or {}))


def _save_raster(path: Path, record: AnyRecord, quality: Optional[int]) -> None:
    from PIL import Image

    array = np.asarray(record.to_array())
    is_stack = array.ndim > 3 or (
        array.ndim == 3 and array.shape[-1] not in (3, 4)
    )
    if is_stack:
        if path.suffix.lower() in {".tif", ".tiff"}:
            _save_tiff_stack(path, array)
            return
        raise UnsupportedFormatError(
            "ND data can only be rasterized as a TIFF stack"
        )
    # BGR wire convention -> RGB for Pillow (swap is symmetric)
    out = rgb_to_bgr(array) if array.ndim == 3 else array
    pil = Image.fromarray(out)
    kwargs: Dict[str, Any] = {}
    exif = getattr(record, "exif", None)
    icc = getattr(record, "icc_profile", None)
    if exif:
        kwargs["exif"] = exif
    if icc:
        kwargs["icc_profile"] = icc
    if quality is not None and path.suffix.lower() in {".jpg", ".jpeg"}:
        kwargs["quality"] = int(quality)
    pil.save(path, **kwargs)


def _save_tiff_stack(path: Path, array: np.ndarray) -> None:
    from PIL import Image

    # colour stacks keep their (H, W, C) planes: flattening with
    # shape[-2:] would fold frame+height together and write (W, C)
    # "grayscale" garbage; each colour plane also needs the same BGR->RGB
    # swap the single-frame raster path applies
    colour = array.ndim >= 4 and array.shape[-1] in (3, 4)
    plane_nd = 3 if colour else 2
    leading = (
        array.reshape((-1,) + array.shape[-plane_nd:])
        if array.ndim > plane_nd
        else array[None, ...] if array.ndim == plane_nd else array
    )
    frames = [
        Image.fromarray(rgb_to_bgr(np.asarray(plane)) if colour else np.asarray(plane))
        for plane in leading
    ]
    frames[0].save(path, save_all=True, append_images=frames[1:])


def _save_numpy(path: Path, record: AnyRecord) -> None:
    array = np.asarray(record.to_array())
    if path.suffix.lower() == ".npy":
        np.save(path, array)
        return
    payload: Dict[str, np.ndarray] = {"image": array}
    if isinstance(record, DimensionalImageRecord):
        payload["dims"] = np.array(record.dims)
        for name, coord in record.coordinates.items():
            payload[f"coord_{name}"] = np.asarray(coord)
    metadata = getattr(record, "metadata", None)
    if metadata:
        # embed (JSON, not pickled) so io_manager-less saves keep the
        # stage/pipeline metadata the batch driver attaches
        try:
            payload["metadata_json"] = np.array(
                json.dumps(metadata, default=str)
            )
        except (TypeError, ValueError):
            pass
    np.savez(path, **payload)


def _save_hdf5(path: Path, record: AnyRecord) -> None:
    import h5py

    array = np.asarray(record.to_array())
    with h5py.File(path, "w") as handle:
        dataset = handle.create_dataset("image", data=array)
        if isinstance(record, DimensionalImageRecord):
            dataset.attrs["dims"] = [str(d) for d in record.dims]
            for name, coord in record.coordinates.items():
                dataset.attrs[f"coord_{name}"] = np.asarray(coord)


__all__ = [
    "ImageRecord",
    "TiledImageRecord",
    "DimensionalImageRecord",
    "UnsupportedFormatError",
    "LAZY_PIXEL_THRESHOLD",
    "should_stream",
    "load_image",
    "save_image",
]
