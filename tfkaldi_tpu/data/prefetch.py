"""Asynchronous host→device batch prefetching.

The reference pays a blocking feed_dict host→device copy per microbatch
inside every step (trainer.py:328-332). Here a background thread stays
``depth`` batches ahead: it pulls utterances from the dispenser, pads them
(DeviceBatcher), and stages them on device (optionally with a mesh
sharding) while the previous step computes.

Rollback support: the training controller's validation rewind
(nnet.py:174-207) must also un-read whatever the prefetcher has buffered —
``rewind(n)`` drains the pipeline and rewinds the dispenser by ``n`` plus
every batch pulled from the dispenser but not yet consumed (including one
potentially in flight inside the worker).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Optional

import jax

from tfkaldi_tpu.data.batching import DeviceBatcher, PaddedBatch
from tfkaldi_tpu.data.dispenser import BatchDispenser

_WORKER_FAILED = object()  # queue sentinel: worker thread died, see _error


class PrefetchingBatchSource:
    """Pulls batches from a dispenser on a worker thread, device-staged."""

    def __init__(
        self,
        dispenser: BatchDispenser,
        batcher: DeviceBatcher,
        depth: int = 2,
        device_put: Optional[Callable[[PaddedBatch], PaddedBatch]] = None,
    ):
        self.dispenser = dispenser
        self.batcher = batcher
        self.depth = max(1, int(depth))
        self.device_put = device_put or (lambda b: jax.tree.map(jax.device_put, b))
        self._queue: queue.Queue = queue.Queue(maxsize=self.depth)
        self._stop = threading.Event()
        self._lock = threading.Lock()  # guards dispenser cursor + _in_flight
        self._in_flight = 0  # batches read from the dispenser, not yet consumed
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None
        self._start_worker()

    # ------------------------------------------------------------------

    def _start_worker(self) -> None:
        self._stop.clear()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self) -> None:
        try:
            while not self._stop.is_set():
                with self._lock:
                    if self._stop.is_set():
                        return
                    # uniform batch-source protocol: the Python dispenser
                    # pads ragged lists via the batcher; the native bulk
                    # source fills the padded buffer in one C++ call
                    host_batch = self.dispenser.get_padded_batch(self.batcher)
                    self._in_flight += 1
                batch = self.device_put(host_batch)
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surface in next() instead of hanging it
            self._error = e
            while not self._stop.is_set():
                try:
                    self._queue.put(_WORKER_FAILED, timeout=0.1)
                    break
                except queue.Full:
                    continue

    # ------------------------------------------------------------------

    def next(self) -> PaddedBatch:
        """Blocking fetch of the next device-resident batch. Re-raises any
        exception the worker thread died on."""
        batch = self._queue.get()
        if batch is _WORKER_FAILED:
            raise RuntimeError("prefetch worker failed") from self._error
        with self._lock:
            self._in_flight -= 1
        return batch

    def _halt_and_drain(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
        while True:
            try:
                self._queue.get_nowait()
            except queue.Empty:
                break

    def rewind(self, num_batches: int) -> None:
        """Rewind ``num_batches`` consumed batches plus everything the
        prefetcher pulled ahead, then resume prefetching."""
        self._halt_and_drain()
        with self._lock:
            total = num_batches + self._in_flight
            self._in_flight = 0
        for _ in range(total):
            self.dispenser.return_batch()
        self._start_worker()

    def close(self) -> None:
        self._halt_and_drain()

    def __enter__(self) -> "PrefetchingBatchSource":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
