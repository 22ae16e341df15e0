"""Profiling / tracing hooks.

The reference's observability is manual perf_counter spans + RTF logging
(`infer_v2.py:610-613,755-761`); the engine reproduces those fields.  This
module adds the TPU-native layer: `jax.profiler` trace capture around any
code region, consumable with tensorboard / xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace (HLO timelines, per-op stats) into
    `log_dir`; view with tensorboard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a captured trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimers:
    """Accumulating wall-clock spans with the reference's field names."""

    def __init__(self):
        self.values: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.values[name] = self.values.get(name, 0.0) + (
                time.perf_counter() - t0)
