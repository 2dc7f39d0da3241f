"""Micro-batching inference front end.

TPU serving economics: the jitted sampler's throughput comes from full
batches, and every distinct (num_steps, batch, cfg-ness) signature is a
compilation.  The batcher therefore:

- coalesces concurrent requests into one device batch per (num_steps,
  guidance) *group*, waiting at most ``max_wait_ms`` for stragglers,
- always pads the prompt list to the fixed ``max_batch`` (padding rows are
  empty prompts whose outputs are dropped), so the compile count is exactly
  one per distinct step count — steady-state serving never recompiles,
- keeps per-request RNG streams independent of batch composition (the
  engine's per-sample ``fold_in`` keyed by a server-wide request counter),
  so a request's image does not depend on which requests it shared a batch
  with.
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class GenerateRequest:
    prompt: str
    num_inference_steps: int = 20
    guidance_scale: float = 7.5
    negative_prompt: str = ""
    seed: Optional[int] = None  # None: server-assigned monotonic stream
    height: Optional[int] = None  # non-square generation (multiples of 8)
    width: Optional[int] = None


@dataclasses.dataclass
class _Pending:
    request: GenerateRequest
    future: Future
    index: int  # server-wide monotonic counter -> RNG stream


class InferenceServer:
    """Wraps a pipeline (``models_registry`` instance with an assigned
    scheduler) behind a thread-safe ``submit`` -> Future API."""

    def __init__(self, pipe, max_batch: int = 8, max_wait_ms: float = 25.0):
        self.pipe = pipe
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._backlog: "collections.deque[_Pending]" = collections.deque()
        self._counter = 0
        self._counter_lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self.stats: Dict[str, Any] = {
            "requests": 0, "images": 0, "batches": 0, "errors": 0,
            "batch_seconds": 0.0,
        }
        self._worker.start()

    # ------------------------------------------------------------- client
    def submit(self, request: GenerateRequest) -> Future:
        if self._stop.is_set():
            raise RuntimeError("server is shut down")
        if request.seed is not None and not isinstance(request.seed, (int, np.integer)):
            # Validate here, in the caller's thread — a malformed seed must
            # become the submitter's error, never a worker-thread death.
            raise ValueError(f"seed must be an integer or null, got {request.seed!r}")
        with self._counter_lock:
            idx = self._counter
            self._counter += 1
        fut: Future = Future()
        self._queue.put(_Pending(request, fut, idx))
        return fut

    def generate(self, request: GenerateRequest, timeout: Optional[float] = None):
        return self.submit(request).result(timeout)

    def shutdown(self, wait: bool = True) -> None:
        self._stop.set()
        self._queue.put(None)  # wake the worker
        if wait:
            self._worker.join(timeout=30)
        # Fail queued-but-unserved requests immediately instead of leaving
        # their callers blocked until timeout.
        err = RuntimeError("server is shut down")
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            if p is not None and not p.future.done():
                p.future.set_exception(err)
        for p in self._backlog:
            if not p.future.done():
                p.future.set_exception(err)
        self._backlog.clear()

    # ------------------------------------------------------------- worker
    @staticmethod
    def _group_key(r: GenerateRequest):
        # Shape is part of the compiled signature, so it must be part of
        # the batching group too.
        return (int(r.num_inference_steps), float(r.guidance_scale),
                r.height, r.width)

    def _loop(self) -> None:
        while not self._stop.is_set():
            # Backlog first: requests spilled from earlier cycles (different
            # signature) are strictly older than anything in the queue, so
            # serving them first bounds their latency — a sustained stream
            # of one signature cannot starve another.
            if self._backlog:
                item = self._backlog.popleft()
            else:
                item = self._queue.get()
                if item is None:
                    continue
            batch = [item]
            key = self._group_key(item.request)
            # Same-signature stragglers from the backlog join for free.
            for p in list(self._backlog):
                if len(batch) >= self.max_batch:
                    break
                if self._group_key(p.request) == key:
                    self._backlog.remove(p)
                    batch.append(p)
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                if self._group_key(nxt.request) == key:
                    batch.append(nxt)
                else:
                    self._backlog.append(nxt)  # older-first next cycle
            try:
                self._run_batch(batch)
            except Exception as e:  # the worker must never die
                self.stats["errors"] += len(batch)
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(e)

    def _run_batch(self, batch: List[_Pending]) -> None:
        import jax

        reqs = [p.request for p in batch]
        n = len(reqs)
        prompts = [r.prompt for r in reqs] + [""] * (self.max_batch - n)
        negatives = [r.negative_prompt for r in reqs] + [""] * (self.max_batch - n)
        # Per-request RNG stream: explicit seed wins, else the monotonic
        # request index — batch composition never changes a request's image.
        indices = np.asarray(
            [r.seed if r.seed is not None else 0x5E4E + p.index for r, p in zip(reqs, batch)]
            + [0] * (self.max_batch - n),
            np.int64,
        )
        size_kw = {}
        if reqs[0].height is not None or reqs[0].width is not None:
            size_kw = dict(height=reqs[0].height, width=reqs[0].width)
        t0 = time.perf_counter()
        try:
            images, exec_time, _ = self.pipe(
                prompts,
                num_inference_steps=reqs[0].num_inference_steps,
                guidance_scale=reqs[0].guidance_scale,
                negative_prompt=negatives,
                sample_indices=indices,
                key=jax.random.PRNGKey(0),
                **size_kw,
            )
        except Exception as e:  # deliver the failure to every caller
            self.stats["errors"] += len(batch)
            for p in batch:
                p.future.set_exception(e)
            return
        wall = time.perf_counter() - t0
        self.stats["requests"] += len(batch)
        self.stats["images"] += len(batch)
        self.stats["batches"] += 1
        self.stats["batch_seconds"] += wall
        for i, p in enumerate(batch):
            p.future.set_result(
                {
                    "image": np.asarray(images[i]),
                    "execution_time": exec_time,
                    "batch_size": n,
                    "nfe": self.pipe.num_timesteps,
                }
            )
