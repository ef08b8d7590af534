"""Rich pipeline history: spillable cached arrays + replayable entries.

Capability parity with the packaged manager's history machinery
(``yam_processor/processing/pipeline_manager.py:220-405``):

* :class:`CachedArray` — keeps arrays under the 1 MiB threshold in memory,
  spills larger ones to ``.npy`` files, and serializes either way (small
  payloads inline as base64);
* :class:`PipelineHistoryEntry` — a step-list snapshot with per-step
  intermediate results that can be replayed from cache without recomputing.
"""
from __future__ import annotations

import base64
import io as _io
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from yamimageprocessor_tpu.pipeline.step import PipelineStep

MEMORY_SPILL_THRESHOLD = 1 * 1024 * 1024  # 1 MiB (reference line 217)


class CachedArray:
    """Array holder with transparent memory/disk placement."""

    def __init__(
        self,
        array: np.ndarray,
        *,
        spill_dir: Optional[Path] = None,
        threshold: int = MEMORY_SPILL_THRESHOLD,
    ) -> None:
        array = np.asarray(array)
        self.shape = tuple(array.shape)
        self.dtype = np.dtype(array.dtype)
        self._memory: Optional[np.ndarray] = None
        self._path: Optional[Path] = None
        if array.nbytes <= threshold or spill_dir is None:
            self._memory = np.array(array, copy=True)
        else:
            spill_dir = Path(spill_dir)
            spill_dir.mkdir(parents=True, exist_ok=True)
            self._path = spill_dir / f"cached-{uuid.uuid4().hex}.npy"
            np.save(self._path, array)

    @property
    def in_memory(self) -> bool:
        return self._memory is not None

    def load(self) -> np.ndarray:
        if self._memory is not None:
            return np.array(self._memory, copy=True)
        return np.load(self._path, allow_pickle=False)

    def release(self) -> None:
        self._memory = None
        if self._path is not None:
            try:
                self._path.unlink()
            except OSError:
                pass
            self._path = None

    # ------------------------------------------------------------------
    def to_payload(self) -> Dict[str, Any]:
        """Serializable form: inline base64 (reference's inline encoding)."""

        buffer = _io.BytesIO()
        np.save(buffer, self.load())
        return {
            "shape": list(self.shape),
            "dtype": str(self.dtype),
            "data_b64": base64.b64encode(buffer.getvalue()).decode("ascii"),
        }

    @classmethod
    def from_payload(
        cls, payload: Dict[str, Any], *, spill_dir: Optional[Path] = None
    ) -> "CachedArray":
        raw = base64.b64decode(payload["data_b64"])
        array = np.load(_io.BytesIO(raw), allow_pickle=False)
        return cls(array, spill_dir=spill_dir)


@dataclass
class PipelineHistoryEntry:
    """One undo/redo record with replayable intermediates."""

    steps: List[PipelineStep]
    intermediates: Dict[int, CachedArray] = field(default_factory=dict)
    final: Optional[CachedArray] = None
    label: str = ""

    @classmethod
    def capture(
        cls,
        steps: Sequence[PipelineStep],
        outputs: Sequence[np.ndarray],
        *,
        spill_dir: Optional[Path] = None,
        label: str = "",
    ) -> "PipelineHistoryEntry":
        entry = cls(steps=[s.clone() for s in steps], label=label)
        for index, output in enumerate(outputs):
            entry.intermediates[index] = CachedArray(output, spill_dir=spill_dir)
        if outputs:
            entry.final = entry.intermediates[len(outputs) - 1]
        return entry

    def replay_from_cache(self, upto: Optional[int] = None) -> Optional[np.ndarray]:
        """Return the cached result at step index ``upto`` (default final)
        without recomputation (``pipeline_manager.py:303-405``)."""

        if upto is None:
            return None if self.final is None else self.final.load()
        cached = self.intermediates.get(upto)
        return None if cached is None else cached.load()

    def release(self) -> None:
        for cached in self.intermediates.values():
            cached.release()
        self.intermediates.clear()
        self.final = None


__all__ = ["CachedArray", "PipelineHistoryEntry", "MEMORY_SPILL_THRESHOLD"]
