"""Profiling and tracing hooks.

The reference's entire profiling story is a wall-clock `timer` context
manager around E/M/H phases and a `runtime` dict echoed to the terminal
(``vlgp/evaluation.py:7-11``, ``vlgp/core.py:285-339``).  Here the same
per-phase telemetry is kept (``vem`` returns the runtime dict), plus
device-level tracing via ``jax.profiler`` for TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time


import jax

__all__ = ["phase_timer", "device_trace", "annotate", "RuntimeLog"]


@contextlib.contextmanager
def phase_timer(log: dict, key: str, sync=None):
    """Time a phase, blocking on ``sync`` (a pytree) if given, and append
    the elapsed seconds to ``log[key]``."""
    tic = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        log.setdefault(key, []).append(time.perf_counter() - tic)


@contextlib.contextmanager
def device_trace(logdir: str, with_perfetto: bool = False):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir, create_perfetto_link=with_perfetto)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces."""
    return jax.profiler.TraceAnnotation(name)


class RuntimeLog:
    """Structured runtime accumulator mirroring the reference's dict
    {it, e_elapsed, m_elapsed, h_elapsed, em_elapsed} (core.py:285-291)."""

    def __init__(self):
        self.data = {"it": 0, "e_elapsed": [], "m_elapsed": [],
                     "h_elapsed": [], "em_elapsed": []}

    def tick(self):
        self.data["it"] += 1

    def phase(self, key: str, sync=None):
        return phase_timer(self.data, key, sync)

    def summary(self) -> dict:
        out = {"iterations": self.data["it"]}
        for k in ("e_elapsed", "m_elapsed", "h_elapsed", "em_elapsed"):
            xs = self.data[k]
            if xs:
                out[k] = {"total": sum(xs), "mean": sum(xs) / len(xs)}
        return out
