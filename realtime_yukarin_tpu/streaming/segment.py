"""Host-side time-indexed segment buffer — reference L4 parity.

Counterpart of ``upstream:realtime_voice_conversion/stream/base_stream.py``
+ ``segment/`` (SURVEY.md §2a): ``add(start, data)`` appends arriving
segments, ``fetch(start, length, extra)`` assembles a zero-padded window,
``remove(end)`` garbage-collects consumed data.  In the TPU build this only
does HOST bookkeeping (re-chunking arbitrary-size audio callbacks onto the
static chunk grid); all per-sample compute lives on-device.
"""

from __future__ import annotations

import numpy as np


class SegmentBuffer:
    """Sparse time-indexed sample buffer over a single global timeline."""

    def __init__(self, dtype=np.float32):
        self._segments: list[tuple[int, np.ndarray]] = []  # (start, data)
        self._dtype = dtype

    def add(self, start: int, data: np.ndarray) -> None:
        """Register ``data`` as occupying [start, start+len)."""
        data = np.asarray(data, self._dtype)
        self._segments.append((int(start), data))
        self._segments.sort(key=lambda s: s[0])

    @property
    def min_time(self) -> int | None:
        return self._segments[0][0] if self._segments else None

    @property
    def max_time(self) -> int | None:
        if not self._segments:
            return None
        return max(s + len(d) for s, d in self._segments)

    def fetch(self, start: int, length: int, extra: int = 0) -> np.ndarray:
        """Assemble [start-extra, start+length+extra), zeros where missing."""
        lo = start - extra
        n = length + 2 * extra
        out = np.zeros(n, self._dtype)
        for s, d in self._segments:
            a = max(s, lo)
            b = min(s + len(d), lo + n)
            if a < b:
                out[a - lo: b - lo] = d[a - s: b - s]
        return out

    def covered(self, start: int, end: int) -> bool:
        """True iff every sample of [start, end) has been added."""
        pos = start
        for s, d in self._segments:
            if s > pos:
                break
            pos = max(pos, min(s + len(d), end))
            if pos >= end:
                return True
        return pos >= end

    def remove(self, end: int) -> None:
        """Drop all data strictly before ``end``."""
        kept = []
        for s, d in self._segments:
            if s + len(d) <= end:
                continue
            if s < end:
                d = d[end - s:]
                s = end
            kept.append((s, d))
        self._segments = kept
