"""Profiling / tracing (reference: the InferenceTimer is the reference's
only tool, dvmvs/utils.py:369-402; here we add device traces).

Usage:
    with device_trace("/tmp/trace"):
        out = step(...)
        np.asarray(out)   # force completion inside the trace
Open the trace with TensorBoard's profile plugin or Perfetto.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def device_trace(log_dir: str):
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times with a warm-up skip; reminds callers
    that timing on TPU requires a host readback (block_until_ready may be
    insufficient behind RPC relays)."""

    def __init__(self, n_skip: int = 20):
        from dvmvs_tpu.utils.results import InferenceTimer

        self._timer = InferenceTimer(n_skip)

    def __enter__(self):
        self._timer.record_start_time()
        return self

    def __exit__(self, *exc):
        self._timer.record_end_time_and_elapsed_time()

    def print_statistics(self):
        self._timer.print_statistics()
