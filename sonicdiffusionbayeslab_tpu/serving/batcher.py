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
  with,
- overlaps batches (``pipeline_depth`` > 1): the worker gets device arrays
  back from the pipeline (``output_type="device"``) and hands the host
  readback + future resolution to a finisher thread, so batch N+1's text
  encode and denoise dispatch while batch N's VAE decode / D2H transfer is
  still in flight — JAX dispatch is async, so the device queue stays full
  back-to-back.  The finisher queue is bounded at ``pipeline_depth - 1``
  outstanding batches, which bounds live device buffers.
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


class ServerOverloadedError(RuntimeError):
    """Raised by ``submit`` when the pending-request depth hit ``max_pending``
    — the serving analogue of HTTP 429.  Callers should back off and retry;
    without this bound a burst beyond device throughput would grow the queue
    (and every caller's latency) without limit."""


@dataclasses.dataclass
class GenerateRequest:
    prompt: str
    num_inference_steps: int = 20
    guidance_scale: float = 7.5
    negative_prompt: str = ""
    seed: Optional[int] = None  # None: server-assigned monotonic stream
    height: Optional[int] = None  # non-square generation (multiples of 8)
    width: Optional[int] = None
    # Queue-wait budget: if the request has not STARTED running on device
    # within this many seconds of submission, it fails with TimeoutError
    # instead of waiting forever behind a backlog.  None = no limit.
    timeout_s: Optional[float] = None


@dataclasses.dataclass
class _Pending:
    request: GenerateRequest
    future: Future
    index: int  # server-wide monotonic counter -> RNG stream
    deadline: Optional[float] = None  # time.monotonic() cutoff (timeout_s)
    resolved: bool = False  # guarded by the server lock: resolve exactly once


class InferenceServer:
    """Wraps a pipeline (``models_registry`` instance with an assigned
    scheduler) behind a thread-safe ``submit`` -> Future API."""

    def __init__(self, pipe, max_batch: int = 8, max_wait_ms: float = 25.0,
                 max_pending: int = 256, pipeline_depth: int = 2,
                 readback_dtype: str = "uint8"):
        self.pipe = pipe
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.max_pending = int(max_pending)
        self.pipeline_depth = max(1, int(pipeline_depth))
        if readback_dtype not in ("uint8", "float32"):
            raise ValueError(
                f"readback_dtype must be 'uint8' or 'float32', got {readback_dtype!r}")
        # 'uint8' (default): quantize images on device BEFORE the D2H
        # transfer.  The readback is the measured serving bottleneck (~1.0 s
        # of a 3.8 s batch-8 cycle for 25 MB of float32 over the axon tunnel,
        # docs/PERF.md serving notes), callers ultimately want uint8 pixels
        # (the HTTP layer encodes PNG), and the device-side round uses the
        # same formula as data/imageio.py::encode_png_bytes — the delivered
        # PNG bytes are identical to the float32 path's.
        self.readback_dtype = readback_dtype
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._backlog: "collections.deque[_Pending]" = collections.deque()
        self._counter = 0
        self._pending = 0  # queued + backlogged, not yet resolved
        self._counter_lock = threading.Lock()
        self._stop = threading.Event()
        self._draining = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self.stats: Dict[str, Any] = {
            "requests": 0, "images": 0, "batches": 0, "errors": 0,
            "rejected": 0, "timeouts": 0, "batch_seconds": 0.0,
        }
        # Batch-overlap stage: bounded hand-off of completed-on-device
        # batches whose host readback happens off the worker thread.
        self._finisher: Optional[threading.Thread] = None
        if self.pipeline_depth > 1:
            self._finish_queue: "queue.Queue" = queue.Queue(
                maxsize=self.pipeline_depth - 1)
            self._finisher = threading.Thread(target=self._finish_loop, daemon=True)
            self._finisher.start()
        self._worker.start()

    # ------------------------------------------------------------- client
    def submit(self, request: GenerateRequest) -> Future:
        if self._stop.is_set() or self._draining.is_set():
            raise RuntimeError("server is shut down")
        if request.seed is not None and not isinstance(request.seed, (int, np.integer)):
            # Validate here, in the caller's thread — a malformed seed must
            # become the submitter's error, never a worker-thread death.
            raise ValueError(f"seed must be an integer or null, got {request.seed!r}")
        with self._counter_lock:
            if self._pending >= self.max_pending:
                self.stats["rejected"] += 1
                raise ServerOverloadedError(
                    f"{self._pending} requests pending (max_pending="
                    f"{self.max_pending}); back off and retry"
                )
            self._pending += 1
            idx = self._counter
            self._counter += 1
        fut: Future = Future()
        deadline = (
            time.monotonic() + float(request.timeout_s)
            if request.timeout_s is not None else None
        )
        self._queue.put(_Pending(request, fut, idx, deadline))
        return fut

    def generate(self, request: GenerateRequest, timeout: Optional[float] = None):
        return self.submit(request).result(timeout)

    def _resolve(self, p: _Pending, *, result=None, exc=None) -> None:
        with self._counter_lock:
            if p.resolved:
                return
            p.resolved = True
            self._pending -= 1
        # Set outside the lock: done-callbacks run in this thread and must be
        # free to call submit() without deadlocking.
        if exc is not None:
            p.future.set_exception(exc)
        else:
            p.future.set_result(result)

    def _expired(self, p: _Pending) -> bool:
        """Fail (and consume) a pending item whose queue-wait deadline passed."""
        if p.deadline is not None and time.monotonic() > p.deadline:
            self.stats["timeouts"] += 1
            self._resolve(p, exc=TimeoutError(
                f"request waited > {p.request.timeout_s}s in queue"))
            return True
        return False

    def shutdown(self, wait: bool = True, drain: bool = False) -> None:
        """Stop the server.  ``drain=True``: refuse new submissions but finish
        everything already queued before stopping (graceful); ``drain=False``:
        stop after the in-flight batch and fail the rest immediately."""
        if drain:
            self._draining.set()
            self._queue.put(None)  # wake the worker if it is idle
            if wait:
                self._worker.join(timeout=300)
        self._stop.set()
        self._queue.put(None)  # wake the worker
        if wait:
            self._worker.join(timeout=30)
        # Everything the worker handed off must resolve before we fail the
        # rest: the worker is joined, so no further puts can race the
        # sentinel.
        if self._finisher is not None:
            self._finish_queue.put(None)
            if wait:
                self._finisher.join(timeout=60)
        # Fail queued-but-unserved requests immediately instead of leaving
        # their callers blocked until timeout.
        err = RuntimeError("server is shut down")
        while True:
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            if p is not None:
                self._resolve(p, exc=err)
        for p in self._backlog:
            self._resolve(p, exc=err)
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
            item = None
            while item is None:
                if self._stop.is_set():
                    return
                if self._backlog:
                    item = self._backlog.popleft()
                else:
                    if self._draining.is_set():
                        # Graceful drain: nothing backlogged — serve whatever
                        # is still queued, then exit when it runs dry.
                        try:
                            item = self._queue.get_nowait()
                        except queue.Empty:
                            return
                    else:
                        item = self._queue.get()
                if item is not None and self._expired(item):
                    item = None
            batch = [item]
            key = self._group_key(item.request)
            # Same-signature stragglers from the backlog join for free.
            for p in list(self._backlog):
                if len(batch) >= self.max_batch:
                    break
                if self._expired(p):
                    self._backlog.remove(p)
                elif self._group_key(p.request) == key:
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
                if self._expired(nxt):
                    continue
                if self._group_key(nxt.request) == key:
                    batch.append(nxt)
                else:
                    self._backlog.append(nxt)  # older-first next cycle
            try:
                self._run_batch(batch)
            except Exception as e:  # the worker must never die
                with self._counter_lock:
                    self.stats["errors"] += len(batch)
                for p in batch:
                    self._resolve(p, exc=e)

    def _run_batch(self, batch: List[_Pending]) -> None:
        import jax

        reqs = [p.request for p in batch]
        n = len(reqs)
        prompts = [r.prompt for r in reqs] + [""] * (self.max_batch - n)
        negatives = [r.negative_prompt for r in reqs] + [""] * (self.max_batch - n)
        # Per-request RNG stream: explicit seed wins, else the monotonic
        # request index — batch composition never changes a request's image.
        # The two spaces are kept disjoint (explicit -> odd, auto -> even) so
        # an explicit seed can never collide with another request's
        # server-assigned stream and silently produce its image.
        indices = np.asarray(
            [int(r.seed) * 2 + 1 if r.seed is not None else (0x5E4E + p.index) * 2
             for r, p in zip(reqs, batch)]
            + [0] * (self.max_batch - n),
            np.int64,
        )
        size_kw = {}
        if reqs[0].height is not None or reqs[0].width is not None:
            size_kw = dict(height=reqs[0].height, width=reqs[0].width)
        pipelined = self._finisher is not None and self._finisher.is_alive()
        t0 = time.perf_counter()
        try:
            # time_loop=False: skip the loop-timing hard sync inside the
            # engine (a serialized host<->device round trip that stalls
            # this worker for the whole denoise).  The batch's denoise +
            # decode + quantize all dispatch asynchronously; the finisher
            # thread blocks on the readback while we dispatch the next
            # batch.  Per-request execution_time becomes the batch wall
            # (dispatch -> host pixels), the honest serving figure.
            images, exec_time, _ = self.pipe(
                prompts,
                num_inference_steps=reqs[0].num_inference_steps,
                guidance_scale=reqs[0].guidance_scale,
                negative_prompt=negatives,
                sample_indices=indices,
                key=jax.random.PRNGKey(0),
                output_type="device",
                time_loop=False,
                **size_kw,
            )
            if self.readback_dtype == "uint8" and isinstance(images, jax.Array):
                import jax.numpy as jnp

                # Same round as encode_png_bytes (clip(x*255+0.5) truncate),
                # run on device so the D2H transfer is 4x smaller.  Non-JAX
                # outputs (mock pipelines in tests) quantize on the host in
                # _finalize instead — the delivered dtype is uint8 either way.
                images = jnp.clip(
                    images.astype(jnp.float32) * 255.0 + 0.5, 0.0, 255.0
                ).astype(jnp.uint8)
        except Exception as e:  # deliver the failure to every caller
            with self._counter_lock:
                self.stats["errors"] += len(batch)
            for p in batch:
                self._resolve(p, exc=e)
            return
        nfe = self.pipe.num_timesteps  # capture NOW: the next overlapped
        # call may change it before the finisher resolves this batch
        if pipelined:
            # Device arrays — the put blocks only when pipeline_depth - 1
            # batches are already awaiting readback (bounded device memory).
            self._finish_queue.put((batch, n, images, exec_time, nfe, t0))
            return
        self._finalize(batch, n, np.asarray(images), exec_time, nfe, t0)

    def _finish_loop(self) -> None:
        """Readback stage: np.asarray blocks on the batch's VAE decode +
        D2H transfer while the worker thread is already dispatching the
        next batch."""
        while True:
            item = self._finish_queue.get()
            if item is None:
                # Shutdown sentinel (sent after the worker stops putting):
                # drain stragglers so no caller is left hanging.
                while True:
                    try:
                        item = self._finish_queue.get_nowait()
                    except queue.Empty:
                        return
                    if item is not None:
                        self._finish_item(item)
                return
            self._finish_item(item)

    def _finish_item(self, item) -> None:
        batch, n, images, exec_time, nfe, t0 = item
        try:
            host = np.asarray(images)
        except Exception as e:  # a deferred device error surfaces here
            with self._counter_lock:
                self.stats["errors"] += len(batch)
            for p in batch:
                self._resolve(p, exc=e)
            return
        self._finalize(batch, n, host, exec_time, nfe, t0)

    def _finalize(self, batch: List[_Pending], n: int, images: np.ndarray,
                  exec_time: float, nfe: int, t0: float) -> None:
        if self.readback_dtype == "uint8" and images.dtype != np.uint8:
            # Host fallback for pipelines that return non-JAX arrays (the
            # device path already quantized before the D2H transfer).
            images = np.clip(
                images.astype(np.float32) * 255.0 + 0.5, 0.0, 255.0
            ).astype(np.uint8)
        wall = time.perf_counter() - t0
        if not isinstance(exec_time, (int, float)) or exec_time < 0:
            # time_loop=False path: the engine skipped loop timing (no
            # serialized sync); report the batch wall — dispatch to host
            # pixels — which is the honest end-to-end serving figure.
            exec_time = wall
        with self._counter_lock:
            self.stats["requests"] += len(batch)
            self.stats["images"] += len(batch)
            self.stats["batches"] += 1
            # dispatch-to-host wall clock; overlapped batches' spans overlap,
            # so the sum can exceed elapsed time under pipeline_depth > 1.
            self.stats["batch_seconds"] += wall
        for i, p in enumerate(batch):
            self._resolve(p, result={
                "image": images[i],
                "execution_time": exec_time,
                "batch_size": n,
                "nfe": nfe,
            })
