"""Tracing / profiling hooks (SURVEY §5 "tracing").

The reference exposes Lightning-profiler passthrough contexts around
forward/loss/metrics (``retriever_module.py:138-144``).  The TPU-native
equivalents:

* ``annotate(name)`` -- a ``jax.profiler.TraceAnnotation`` + ``named_scope``
  context so ranges show up both in host traces and XLA op names;
* ``trace(log_dir)`` -- capture a profiler trace viewable in
  TensorBoard/Perfetto;
* ``device_memory_stats`` -- HBM live/peak bytes for leak hunting.
"""

from __future__ import annotations

import contextlib
import pathlib
from typing import Iterator

import jax


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name), jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace(log_dir: str | pathlib.Path) -> Iterator[None]:
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict[str, int]:
    if device is None:
        device = jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
