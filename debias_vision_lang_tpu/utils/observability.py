"""Observability: structured metrics logging, profiling hooks, debug modes.

The reference has print + tqdm only, and indirect evidence of Neptune
tracking in the unreleased trainer (``neptune_run_OXVLB-317`` in the shipped
checkpoint name — reference: debias_clip/model/clip.py:16; SURVEY.md §5).
Here: a JSONL metrics logger (machine-readable, no external tracker), an
optional TensorBoard scalar writer, ``jax.profiler`` trace context for
HLO/Mosaic cost analysis, and a debug-NaN toggle.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


def _is_scalar_like(v) -> bool:
    """numpy/jax 0-d scalar (shape () with an item())."""
    return getattr(v, "shape", None) == () and hasattr(v, "item")


def _to_jsonable(v):
    if _is_scalar_like(v):
        return v.item()
    if hasattr(v, "tolist"):  # numpy/jax arrays
        return v.tolist()
    raise TypeError(f"metric value of type {type(v).__name__} "
                    "is not JSON-serializable")


class MetricsLogger:
    """Append-only JSONL metrics + optional TensorBoard scalars."""

    def __init__(self, log_dir: str, tensorboard: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._file = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except ImportError:
                pass

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        record = {"time": time.time(), **metrics}
        if step is not None:
            record["step"] = step
        # numpy/jax scalars aren't JSON-serializable and must not kill a
        # training run mid-flight; anything float()-able is coerced
        self._file.write(json.dumps(record, default=_to_jsonable) + "\n")
        if self._tb is not None and step is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)) or _is_scalar_like(v):
                    self._tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace around a region (view with tensorboard-plugin-profile)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(logger: Optional[MetricsLogger] = None, name: str = "step_time_s",
               step: Optional[int] = None):
    """Wall-clock timer; logs to the metrics logger when given."""
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        box["elapsed"] = time.perf_counter() - t0
        if logger is not None:
            logger.log({name: box["elapsed"]}, step=step)


def enable_debug_nans(on: bool = True) -> None:
    """Race/NaN detection analogue: pure-functional steps have no data races
    (SURVEY.md §5); the numerics failure mode is NaNs — flag-guarded."""
    import jax

    jax.config.update("jax_debug_nans", on)
