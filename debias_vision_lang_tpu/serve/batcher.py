"""Micro-batching request aggregator for serving.

TPU throughput lives or dies by batch size (PERF.md: a ViT-B/16 step at
batch 256 embeds ~4,100 img/s; at batch 1 the same launch overhead buys ~60
images less).  The batcher turns a stream of single-item requests into
device-sized batches: the first request opens a window of ``max_wait_ms``;
everything that arrives inside it (up to ``max_batch``) rides the same
device launch.

Deterministic contract: ``run_batch`` receives the items in arrival order
and must return one result per item along axis 0 (or a list).  Exceptions
from ``run_batch`` propagate to every future of that batch.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, List, Optional, Sequence


class MicroBatcher:
    """Background-thread request aggregator.

    ``submit(item)`` returns a ``concurrent.futures.Future``; results are the
    per-item slices of ``run_batch``'s output.
    """

    def __init__(
        self,
        run_batch: Callable[[List[Any]], Sequence[Any]],
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
        name: str = "microbatch",
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._run_batch = run_batch
        self._max_batch = int(max_batch)
        self._max_wait_s = float(max_wait_ms) / 1e3
        self._q: "queue.Queue[Optional[tuple]]" = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._worker, name=name,
                                        daemon=True)
        self._thread.start()

    def submit(self, item: Any) -> Future:
        if self._closed:
            raise RuntimeError("batcher is closed")
        fut: Future = Future()
        self._q.put((item, fut))
        return fut

    def close(self, timeout: float = 5.0) -> None:
        """Drain outstanding work and stop the worker."""
        if self._closed:
            return
        self._closed = True
        self._q.put(None)  # sentinel
        self._thread.join(timeout=timeout)

    # -- worker --------------------------------------------------------------

    def _collect(self) -> Optional[List[tuple]]:
        """Block for the first request, then drain the arrival window."""
        head = self._q.get()
        if head is None:
            return None
        batch = [head]
        deadline = time.monotonic() + self._max_wait_s
        while len(batch) < self._max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:  # close() while collecting: flush what we have
                self._q.put(None)
                break
            batch.append(nxt)
        return batch

    def _worker(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            items = [item for item, _ in batch]
            futures = [fut for _, fut in batch]
            try:
                results = self._run_batch(items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"run_batch returned {len(results)} results "
                        f"for {len(items)} items")
            except Exception as e:  # noqa: BLE001 - propagate to callers
                for fut in futures:
                    fut.set_exception(e)
                continue
            for fut, res in zip(futures, results):
                fut.set_result(res)
