"""Progress reporting and phase timing.

The reference gives every module its own ProgressListener trait reporting
normalized [0,1] progress into an indicatif bar (reconstruction.rs:840-905)
and prints per-phase wall-clock lines like "Completed X in N seconds"
(reconstruction.rs:316-318 et al.).  This module reproduces both: a minimal
terminal progress bar and a context-manager phase timer with the same
stdout phrasing so runs are drop-in comparable.

The reference's per-level scale^2 progress rescaling
(reconstruction.rs:866-893) lives directly in the pyramid loop
(ops.correlation.correlate_images: done/total over scale^2) — each level
is one fused dispatch here, so there is no sub-phase to rescale.
"""

from __future__ import annotations

import sys
import time
from typing import Protocol


class ProgressListener(Protocol):
    def report_status(self, pos: float) -> None: ...


class NullProgress:
    def report_status(self, pos: float) -> None:
        pass

    def report_matches(self, count: int) -> None:
        pass

    def finish(self) -> None:
        pass


class ProgressBar:
    """Terminal progress bar: 40-char bar + percent, like the reference's
    indicatif template (reconstruction.rs:840-853)."""

    def __init__(self, show_message: bool = False, stream=None):
        self._stream = stream if stream is not None else sys.stderr
        self._show_message = show_message
        self._message = ""
        self._last_render = 0.0
        self._last_len = 0
        self._enabled = hasattr(self._stream, "isatty") and self._stream.isatty()

    def report_status(self, pos: float) -> None:
        if not self._enabled:
            return
        now = time.monotonic()
        if now - self._last_render < 0.1:
            return
        self._last_render = now
        pos = min(max(pos, 0.0), 1.0)
        filled = int(pos * 40)
        bar = "█" * filled + "░" * (40 - filled)
        msg = self._message if self._show_message else ""
        line = f"{bar} {pos * 100.0:.2f}%{msg}"
        self._last_len = max(self._last_len, len(line))
        self._stream.write("\r" + line)
        self._stream.flush()

    def report_matches(self, count: int) -> None:
        if count > 0:
            self._message = f", {count} matches"

    def finish(self) -> None:
        if self._enabled:
            # Clear the longest line actually rendered (a fixed 60 cols
            # left residue from long ", N matches" suffixes).
            self._stream.write("\r" + " " * self._last_len + "\r")
            self._stream.flush()


class DetailTimer:
    """Sub-phase timing, printed only when CVTPU_PHASE_DETAIL is set.

    The reference's observability stops at per-phase wall-clock prints
    (reconstruction.rs:316-318); this opt-in layer breaks the output
    phase down further (rgb decode / meshing / serialization) for
    perf work on the bursty host vCPU.
    """

    def __init__(self, name: str):
        import os

        self._name = name
        self._enabled = bool(os.environ.get("CVTPU_PHASE_DETAIL"))

    def __enter__(self):
        self._start = time.monotonic()
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None and self._enabled:
            dt = time.monotonic() - self._start
            print(f"  [detail] {self._name}: {dt:.3f}s")
        return False


# Optional process-global phase accumulator (collect_phases): every
# PhaseTimer exit adds its elapsed seconds under its phrase. The bench
# uses this to emit a machine-readable per-phase breakdown next to the
# headline number — the structured form of the reference's wall-clock
# prints (reconstruction.rs:316-318).
_PHASE_ACCUM: dict[str, float] | None = None


def collect_phases() -> dict[str, float]:
    """Start a fresh phase accumulation; returns the live dict (phrase ->
    summed seconds) that subsequent PhaseTimers will add into."""
    global _PHASE_ACCUM
    _PHASE_ACCUM = {}
    return _PHASE_ACCUM


class PhaseTimer:
    """Context manager printing 'Completed <phase> in N seconds'."""

    def __init__(self, phrase: str, quiet: bool = False):
        self._phrase = phrase
        self._quiet = quiet
        self.elapsed = 0.0

    def __enter__(self):
        self._start = time.monotonic()
        return self

    def __exit__(self, exc_type, exc, tb):
        self.elapsed = time.monotonic() - self._start
        if _PHASE_ACCUM is not None:
            _PHASE_ACCUM[self._phrase] = (
                _PHASE_ACCUM.get(self._phrase, 0.0) + self.elapsed
            )
        if exc_type is None and not self._quiet:
            print(f"{self._phrase} in {self.elapsed:.3f} seconds")
        return False
