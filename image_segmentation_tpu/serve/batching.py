"""Request micro-batching for serving.

The reference webapp runs one eager forward per HTTP request on CPU
(reference segmentation_webapp/app.py:281-288). On an accelerator,
single-image forwards waste almost the whole chip; this wrapper
collects concurrent requests into fixed-shape batches:

  * per-model FIFO queues served round-robin; a worker thread drains a
    queue into a batch of up to `max_batch`, waiting at most
    `max_wait_ms` for stragglers — but ONLY when more than one request
    is already queued (a lone request dispatches immediately);
  * batches are PADDED to `max_batch` by repeating the last item, so
    the jitted forward compiles exactly once per model;
  * host-side staging (resize+pad) and un-staging (inverse geometry,
    argmax, colourise) run in the caller's thread — only the device
    forward is serialised.

Single-stream latency is unchanged (one request → one padded batch);
under concurrency, throughput approaches the batched-forward rate.
"""
from __future__ import annotations

import threading
import time
from collections import defaultdict, deque
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from image_segmentation_tpu.serve.engine import (
    InferenceEngine,
    stage_request,
    unstage_result,
)


class _Pending:
    __slots__ = ("inputs", "event", "scores", "error")

    def __init__(self, inputs):
        self.inputs = inputs  # tuple of (T,T,C) arrays
        self.event = threading.Event()
        self.scores = None
        self.error = None


class BatchingEngine:
    """Wraps an InferenceEngine with per-model request batching.

    Drop-in `segment()` API; `close()` stops the worker.
    """

    def __init__(
        self,
        engine: InferenceEngine,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        max_inflight: int = 3,
    ):
        import concurrent.futures

        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._queues: Dict[str, deque] = defaultdict(deque)
        self._cv = threading.Condition()
        self._closed = False
        self._last_served: Optional[str] = None
        # Dispatch/fetch overlap: jax dispatches are async, but the
        # device→host score fetch is not — fetching batch k inline in
        # the worker idles the device for the whole transfer (bf16
        # scores at batch 8 are ~3 MB, a large fraction of the batch's
        # device time over a remote-device link). The worker therefore
        # hands each dispatched batch's FETCH to this small pool and
        # immediately dispatches the next batch; `max_inflight` bounds
        # the dispatched-but-unfetched batches so device score buffers
        # can't pile up under a slow host link.
        self._fetch_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="serve-fetch")
        self._inflight = threading.Semaphore(max_inflight)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- worker -----------------------------------------------------------

    def _run(self):
        while True:
            with self._cv:
                while not self._closed and not any(self._queues.values()):
                    self._cv.wait()
                if self._closed:
                    self._drain_locked()
                    return
                # round-robin across models: always resuming at the
                # first-registered queue would starve every other model
                # under sustained load on that one
                keys = list(self._queues.keys())
                if self._last_served in keys:
                    i = keys.index(self._last_served) + 1
                    keys = keys[i:] + keys[:i]
                name = next(m for m in keys if self._queues[m])
                self._last_served = name
                q = self._queues[name]
                if len(q) > 1:
                    # concurrency observed: give stragglers up to the
                    # window to fill the batch
                    deadline = time.monotonic() + self.max_wait_s
                    while len(q) < self.max_batch and not self._closed:
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            break
                        self._cv.wait(timeout=remaining)
                # a lone request dispatches immediately — single-stream
                # latency pays no wait window; under load, requests that
                # arrive during this forward coalesce into the next batch
                batch = [q.popleft() for _ in range(min(len(q), self.max_batch))]
            self._process(name, batch)

    def _drain_locked(self):
        """Fail every queued request on shutdown (callers would otherwise
        block their full timeout). Caller holds _cv."""
        for q in self._queues.values():
            while q:
                p = q.popleft()
                p.error = RuntimeError("BatchingEngine closed")
                p.event.set()

    def _process(self, name: str, batch):
        entry = self.engine.models[name]
        try:
            n_inputs = len(batch[0].inputs)
            # bucket to the next power of two, capped at max_batch: at most
            # log2(max_batch)+1 compiled variants per model, ≤2× transfer
            # waste (padding straight to max_batch would ship up to
            # max_batch× the bytes)
            bucket = 1
            while bucket < len(batch):
                bucket *= 2
            bucket = min(bucket, self.max_batch)
            stacked = []
            for i in range(n_inputs):
                arrs = [p.inputs[i] for p in batch]
                while len(arrs) < bucket:
                    arrs.append(arrs[-1])
                # host array: forward device-puts it (the composed
                # prompt path hashes staged bytes for its score cache)
                stacked.append(np.stack(arrs))
            self._inflight.acquire()
            try:
                # async dispatch; padding sliced off ON DEVICE so padded
                # rows never cross the host link
                scores_dev = entry.forward(*stacked)[: len(batch)]
            except BaseException:
                self._inflight.release()
                raise
        except Exception as e:  # pragma: no cover
            for p in batch:
                p.error = e
                p.event.set()
            return
        # the fetch (the slow, host-bound half) overlaps the NEXT
        # batch's device compute — see __init__
        self._fetch_pool.submit(self._fetch, scores_dev, batch)

    def _fetch(self, scores_dev, batch):
        try:
            scores = np.asarray(scores_dev, dtype=np.float32)
            for j, p in enumerate(batch):
                p.scores = scores[j]
        except Exception as e:  # pragma: no cover
            for p in batch:
                p.error = e
        finally:
            self._inflight.release()
            for p in batch:
                p.event.set()

    # -- API --------------------------------------------------------------

    def warmup(self, model_names=None) -> None:
        """Pre-compile every power-of-two bucket shape for the given models
        (all registered models by default) so no live request pays a
        compile stall."""
        for name in model_names or self.engine.available():
            entry = self.engine.models[name]
            t = entry.target_size
            dt = np.uint8 if getattr(self.engine, "fast_transfer", False) else np.float32
            buckets = []
            b = 1
            while b < self.max_batch:
                buckets.append(b)
                b *= 2
            buckets.append(self.max_batch)  # the cap bucket itself
            for b in buckets:
                inputs = [np.zeros((b, t, t, 3), dt)]
                if entry.needs_prompt:
                    inputs.append(np.zeros((b, t, t, 1), dt))
                np.asarray(entry.forward(*inputs)[:1, 0, 0])

    def available(self):
        return self.engine.available()

    @property
    def models(self):
        return self.engine.models

    def segment(
        self,
        image: np.ndarray,
        model_name: str,
        prompt_mask: Optional[np.ndarray] = None,
        timeout: float = 60.0,
    ):
        if model_name not in self.engine.models:
            raise KeyError(
                f"unknown model {model_name!r}; available: {self.available()}"
            )
        entry = self.engine.models[model_name]
        inputs, meta = stage_request(
            image, entry, prompt_mask,
            getattr(self.engine, "fast_transfer", False),
        )

        pending = _Pending(inputs)
        with self._cv:
            if self._closed:
                raise RuntimeError("BatchingEngine is closed")
            self._queues[model_name].append(pending)
            self._cv.notify_all()
        if not pending.event.wait(timeout):
            raise TimeoutError("inference worker timed out")
        if pending.error is not None:
            raise pending.error

        return unstage_result(pending.scores, meta, entry)

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._worker.join(timeout=5)
        # drain pending fetches (they complete their requests' events)
        self._fetch_pool.shutdown(wait=True)
