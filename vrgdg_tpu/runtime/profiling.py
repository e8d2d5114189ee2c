"""Tracing and per-stage telemetry.

The reference's observability is wall-clock telemetry in result payloads
(``elapsed_seconds`` / ``processed_fps``, ``VRGDG_LUTVideoTools.py:241-259,
1039-1064``).  SURVEY.md section 5.1 calls for the TPU equivalents on top:

- :func:`trace`: a ``jax.profiler`` trace context for offline analysis
  (TensorBoard/xprof).  Enable for any run by setting
  ``VRGDG_TPU_TRACE=/path/to/dir`` — every applier wraps its device loop
  in :func:`maybe_trace` — or use the context manager directly.
- :class:`StageTimer`: cheap named wall-clock accumulators so appliers and
  jobs can report a ``stage_seconds`` breakdown (decode / device / encode)
  in their result dicts, plus ``fps_per_chip`` (the job engine reports
  this per segment already).
"""

from __future__ import annotations

import contextlib
import os
import time

TRACE_ENV = "VRGDG_TPU_TRACE"


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler.trace`` wrapper; the trace lands in ``log_dir`` as an
    xplane capture viewable with TensorBoard's profile plugin."""
    import jax

    with jax.profiler.trace(os.fspath(log_dir)):
        yield


@contextlib.contextmanager
def maybe_trace(label: str = ""):
    """Trace into ``$VRGDG_TPU_TRACE/<label>`` when the env var is set,
    no-op otherwise — the hook every applier/job wraps its hot loop in."""
    root = os.environ.get(TRACE_ENV, "").strip()
    if not root:
        yield None
        return
    target = os.path.join(root, label) if label else root
    os.makedirs(target, exist_ok=True)
    with trace(target):
        yield target


class StageTimer:
    """Named wall-clock accumulators for a stage breakdown.

    >>> timer = StageTimer()
    >>> with timer.stage("decode"): ...
    >>> timer.seconds()  # {"decode": ...}
    """

    def __init__(self):
        self._totals: dict[str, float] = {}
        self._counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self._totals[name] = self._totals.get(name, 0.0) + elapsed
            self._counts[name] = self._counts.get(name, 0) + 1

    def add(self, name: str, seconds: float) -> None:
        self._totals[name] = self._totals.get(name, 0.0) + float(seconds)
        self._counts[name] = self._counts.get(name, 0) + 1

    def seconds(self) -> dict[str, float]:
        return {name: round(total, 6) for name, total in self._totals.items()}

    def counts(self) -> dict[str, int]:
        return dict(self._counts)
