"""Serving subsystem: micro-batching correctness (coalescing, padding,
request-independent RNG streams, error delivery) + the HTTP front end."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry
from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler
from sonicdiffusionbayeslab_tpu.serving import (
    GenerateRequest,
    InferenceServer,
    ServerOverloadedError,
)


@pytest.fixture(scope="module")
def pipe():
    load_all_plugins()
    p = models_registry["stable_diffusion_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32"
    )
    p.scheduler = DPMSolverScheduler(solver_order=2)
    return p


@pytest.fixture()
def server(pipe):
    s = InferenceServer(pipe, max_batch=4, max_wait_ms=150.0)
    yield s
    s.shutdown()


def test_single_request(server):
    out = server.generate(GenerateRequest("a cat", num_inference_steps=3), timeout=300)
    assert out["image"].shape == (16, 16, 3)
    assert np.isfinite(out["image"]).all()
    assert out["nfe"] == 3


def test_async_dispatch_reports_batch_wall(server):
    """The serving path runs the engine with time_loop=False (no serialized
    loop-timing sync); the per-request execution_time must come back as the
    positive batch wall, never the -1.0 'not timed' sentinel."""
    out = server.generate(GenerateRequest("a dog", num_inference_steps=3), timeout=300)
    assert out["execution_time"] > 0


def test_encode_memo_uniform_batches(pipe):
    """Uniform prompt batches (the all-'' negative every serving batch) are
    encoded once and memoized; mixed batches bypass the memo."""
    e1 = pipe._encode(["", ""])
    e2 = pipe._encode(["", ""])
    assert e2 is e1  # memo hit
    e3 = pipe._encode(["", "", ""])  # different batch size -> distinct entry
    assert e3 is not e1 and e3.shape[0] == 3
    m1 = pipe._encode(["a cat", "a dog"])
    m2 = pipe._encode(["a cat", "a dog"])
    assert m1 is not m2  # mixed batch: uncached
    import numpy as _np
    _np.testing.assert_array_equal(_np.asarray(e1), _np.asarray(pipe._encode_uncached(["", ""])))


def test_concurrent_requests_coalesce(server):
    """4 concurrent same-signature requests ride ONE device batch."""
    futs = [
        server.submit(GenerateRequest(f"prompt {i}", num_inference_steps=3))
        for i in range(4)
    ]
    outs = [f.result(timeout=300) for f in futs]
    assert all(o["image"].shape == (16, 16, 3) for o in outs)
    assert any(o["batch_size"] == 4 for o in outs)
    assert server.stats["batches"] < server.stats["requests"]


def test_rng_independent_of_batch_composition(server):
    """A seeded request's image is identical whether it runs alone or shares
    a batch (per-sample fold_in streams, not batch-position RNG)."""
    solo = server.generate(
        GenerateRequest("a cat", num_inference_steps=3, seed=123), timeout=300
    )
    futs = [
        server.submit(GenerateRequest("a cat", num_inference_steps=3, seed=123)),
        server.submit(GenerateRequest("a dog", num_inference_steps=3, seed=77)),
        server.submit(GenerateRequest("a fish", num_inference_steps=3, seed=78)),
    ]
    shared = futs[0].result(timeout=300)
    _ = [f.result(timeout=300) for f in futs[1:]]
    np.testing.assert_allclose(solo["image"], shared["image"], atol=1e-5)


def test_uint8_readback_matches_float_path(pipe):
    """Default readback is uint8 quantized ON DEVICE (4x smaller D2H — the
    measured serving bottleneck, docs/PERF.md) using encode_png_bytes'
    round formula, so the delivered PNG is byte-identical to the float32
    readback path's."""
    from sonicdiffusionbayeslab_tpu.data.imageio import encode_png_bytes

    req = GenerateRequest("a cat", num_inference_steps=3, seed=9)
    s8 = InferenceServer(pipe, max_batch=2, max_wait_ms=50.0)
    try:
        out8 = s8.generate(req, timeout=300)
    finally:
        s8.shutdown()
    sf = InferenceServer(pipe, max_batch=2, max_wait_ms=50.0,
                         readback_dtype="float32")
    try:
        outf = sf.generate(req, timeout=300)
    finally:
        sf.shutdown()
    assert out8["image"].dtype == np.uint8
    assert outf["image"].dtype == np.float32
    assert encode_png_bytes(out8["image"]) == encode_png_bytes(outf["image"])
    with pytest.raises(ValueError, match="readback_dtype"):
        InferenceServer(pipe, readback_dtype="bf16")


def test_mixed_signatures_split_batches(server):
    """Different step counts cannot share a compiled program — the batcher
    must split them, and every request still completes."""
    futs = [
        server.submit(GenerateRequest("a", num_inference_steps=3)),
        server.submit(GenerateRequest("b", num_inference_steps=2)),
        server.submit(GenerateRequest("c", num_inference_steps=3)),
    ]
    outs = [f.result(timeout=300) for f in futs]
    assert [o["nfe"] for o in outs] == [3, 2, 3]


def test_malformed_seed_is_submitters_error(server):
    """A bad seed must raise in the caller, not kill the worker thread."""
    with pytest.raises(ValueError, match="seed"):
        server.submit(GenerateRequest("a cat", num_inference_steps=2, seed="abc"))
    # The worker is still alive and serving.
    out = server.generate(GenerateRequest("a cat", num_inference_steps=2), timeout=300)
    assert out["image"].shape == (16, 16, 3)


def test_shutdown_fails_queued_requests_fast(pipe):
    s = InferenceServer(pipe, max_batch=4, max_wait_ms=50.0)
    s.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        s.submit(GenerateRequest("a cat"))


def test_http_server_end_to_end(pipe):
    from sonicdiffusionbayeslab_tpu.serving.server import serve

    ready = threading.Event()
    t = threading.Thread(
        target=serve,
        args=(pipe, "stable_diffusion_model"),
        kwargs=dict(host="127.0.0.1", port=0, max_batch=2, max_wait_ms=50.0,
                    ready_event=ready),
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=30)
    httpd = ready.httpd  # type: ignore[attr-defined]
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["devices"] >= 1

        req = urllib.request.Request(
            f"{base}/generate",
            data=json.dumps({"prompt": "a cat", "steps": 2, "guidance": 5.0}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["nfe"] == 2 and len(out["image_png_base64"]) > 100

        import base64

        png = base64.b64decode(out["image_png_base64"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            metrics = json.loads(r.read())
        assert metrics["images"] >= 1

        bad = urllib.request.Request(f"{base}/generate", data=b"{}",
                                     headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        ready.inference.shutdown(wait=False)  # type: ignore[attr-defined]


class _BlockingPipe:
    """Duck-typed pipe whose device step blocks until released — makes
    overload/timeout behavior deterministic without timing the real model."""

    num_timesteps = 2

    def __init__(self, delay_s=None):
        self.release = threading.Event()
        self.delay_s = delay_s
        self.calls = 0

    def __call__(self, prompts, **kw):
        self.calls += 1
        if self.delay_s is not None:
            time.sleep(self.delay_s)
        else:
            assert self.release.wait(timeout=60), "test forgot to release the pipe"
        n = len(prompts)
        return np.zeros((n, 4, 4, 3), np.float32), 0.01, None


def test_overload_rejects_submit(pipe):
    """Backpressure: beyond max_pending, submit raises ServerOverloadedError
    (the 429 analogue) instead of growing the queue without bound."""
    fake = _BlockingPipe()
    s = InferenceServer(fake, max_batch=1, max_wait_ms=1.0, max_pending=3)
    try:
        futs = [s.submit(GenerateRequest(f"p{i}", num_inference_steps=2))
                for i in range(3)]
        with pytest.raises(ServerOverloadedError, match="back off"):
            s.submit(GenerateRequest("overflow", num_inference_steps=2))
        assert s.stats["rejected"] == 1
        fake.release.set()
        outs = [f.result(timeout=60) for f in futs]
        assert len(outs) == 3
        # Capacity freed: submissions are accepted again.
        assert s.submit(GenerateRequest("after", num_inference_steps=2)).result(60)
    finally:
        fake.release.set()
        s.shutdown()


def test_queue_wait_timeout(pipe):
    """A request whose timeout_s elapses while waiting behind a slow batch
    fails with TimeoutError; the server keeps serving."""
    fake = _BlockingPipe()
    s = InferenceServer(fake, max_batch=1, max_wait_ms=1.0)
    try:
        a = s.submit(GenerateRequest("a", num_inference_steps=2))
        while fake.calls == 0:  # a is on "device", blocked
            time.sleep(0.005)
        b = s.submit(GenerateRequest("b", num_inference_steps=2, timeout_s=0.05))
        time.sleep(0.15)  # b's queue-wait budget expires behind a
        fake.release.set()
        assert a.result(timeout=60)
        with pytest.raises(TimeoutError, match="waited"):
            b.result(timeout=60)
        assert s.stats["timeouts"] == 1
        assert s.submit(GenerateRequest("c", num_inference_steps=2)).result(60)
    finally:
        fake.release.set()
        s.shutdown()


def test_graceful_drain_serves_queued_then_stops(pipe):
    """shutdown(drain=True) finishes everything already queued — zero lost
    futures — then refuses new work."""
    fake = _BlockingPipe(delay_s=0.02)
    s = InferenceServer(fake, max_batch=2, max_wait_ms=1.0)
    futs = [s.submit(GenerateRequest(f"p{i}", num_inference_steps=2))
            for i in range(6)]
    s.shutdown(wait=True, drain=True)
    outs = [f.result(timeout=1) for f in futs]  # already resolved: no waiting
    assert len(outs) == 6
    with pytest.raises(RuntimeError, match="shut down"):
        s.submit(GenerateRequest("late"))


def test_load_64_concurrent_zero_lost(pipe):
    """Overload soak (docs/SERVING.md claim): 64 concurrent requests at
    max_batch 8 — every future resolves, none lost, queue stays bounded."""
    s = InferenceServer(pipe, max_batch=8, max_wait_ms=30.0, max_pending=128)
    try:
        futs = [s.submit(GenerateRequest(f"prompt {i}", num_inference_steps=2))
                for i in range(64)]
        outs = [f.result(timeout=600) for f in futs]
        assert len(outs) == 64
        assert all(o["image"].shape == (16, 16, 3) for o in outs)
        assert s.stats["requests"] == 64
        assert s.stats["errors"] == 0 and s.stats["timeouts"] == 0
        # Coalescing actually happened: far fewer batches than requests.
        assert s.stats["batches"] <= 16
    finally:
        s.shutdown()


def test_nonsquare_requests_group_by_shape(server):
    """height/width join the batching signature: a 64x128 request and a
    square one run in different batches, both complete."""
    futs = [
        server.submit(GenerateRequest("a", num_inference_steps=2, height=64, width=128)),
        server.submit(GenerateRequest("b", num_inference_steps=2)),
        server.submit(GenerateRequest("c", num_inference_steps=2, height=64, width=128)),
    ]
    outs = [f.result(timeout=600) for f in futs]
    assert outs[0]["image"].shape == (16, 32, 3)
    assert outs[1]["image"].shape == (16, 16, 3)
    assert outs[2]["image"].shape == (16, 32, 3)


# ---------------------------------------------------------------------------
# Batch-overlap pipelining (pipeline_depth > 1): the worker hands host
# readback to a finisher thread so batch N+1 dispatches while batch N's
# decode/D2H is in flight.
# ---------------------------------------------------------------------------


class _LazyArray:
    """Device-array stand-in whose host readback (``__array__``) is slow —
    models the VAE-decode + D2H transfer np.asarray blocks on."""

    def __init__(self, shape, readback_s, log, tag):
        self.shape = shape
        self.readback_s = readback_s
        self.log = log
        self.tag = tag

    def __array__(self, *args, **kw):
        time.sleep(self.readback_s)
        self.log.append(("readback_done", self.tag, time.monotonic()))
        return np.zeros(self.shape, np.float32)


class _OverlapPipe:
    """Fast 'device step', slow readback; logs call/readback timestamps."""

    num_timesteps = 2

    def __init__(self, compute_s=0.05, readback_s=0.3):
        self.compute_s = compute_s
        self.readback_s = readback_s
        self.log = []
        self.calls = 0

    def __call__(self, prompts, output_type="np", **kw):
        self.calls += 1
        self.log.append(("call", self.calls, time.monotonic()))
        time.sleep(self.compute_s)
        arr = _LazyArray((len(prompts), 4, 4, 3), self.readback_s, self.log, self.calls)
        if output_type == "device":
            return arr, 0.01, None
        return np.asarray(arr), 0.01, None


def test_pipelined_worker_overlaps_readback():
    """With pipeline_depth=2 the worker dispatches batch 2 while batch 1's
    readback is still running (the load-bearing overlap claim)."""
    fake = _OverlapPipe(compute_s=0.05, readback_s=0.4)
    s = InferenceServer(fake, max_batch=1, max_wait_ms=1.0, pipeline_depth=2)
    try:
        futs = [s.submit(GenerateRequest(f"p{i}", num_inference_steps=2))
                for i in range(3)]
        outs = [f.result(timeout=60) for f in futs]
        assert all(o["image"].shape == (4, 4, 3) for o in outs)
        calls = [t for kind, _, t in fake.log if kind == "call"]
        readbacks = [t for kind, _, t in fake.log if kind == "readback_done"]
        assert len(calls) == 3 and len(readbacks) == 3
        # batch 2's device call started BEFORE batch 1's readback finished.
        assert calls[1] < readbacks[0], (calls, readbacks)
        assert s.stats["batches"] == 3 and s.stats["errors"] == 0
    finally:
        s.shutdown()


def test_pipeline_depth_1_is_serial():
    """Control: depth=1 keeps the old fully-serial worker (readback before
    the next dispatch)."""
    fake = _OverlapPipe(compute_s=0.01, readback_s=0.2)
    s = InferenceServer(fake, max_batch=1, max_wait_ms=1.0, pipeline_depth=1)
    try:
        futs = [s.submit(GenerateRequest(f"p{i}", num_inference_steps=2))
                for i in range(2)]
        [f.result(timeout=60) for f in futs]
        calls = [t for kind, _, t in fake.log if kind == "call"]
        readbacks = [t for kind, _, t in fake.log if kind == "readback_done"]
        assert calls[1] >= readbacks[0], (calls, readbacks)
    finally:
        s.shutdown()


def test_pipelined_results_match_serial(pipe):
    """The overlap is pure plumbing: a seeded request's image is identical
    through a pipelined server and a depth-1 server."""
    s1 = InferenceServer(pipe, max_batch=2, max_wait_ms=1.0, pipeline_depth=1)
    s2 = InferenceServer(pipe, max_batch=2, max_wait_ms=1.0, pipeline_depth=3)
    try:
        req = GenerateRequest("a red boat", num_inference_steps=3, seed=11)
        a = s1.generate(req, timeout=300)
        b = s2.generate(req, timeout=300)
        np.testing.assert_array_equal(a["image"], b["image"])
        assert b["nfe"] == a["nfe"] == 3
    finally:
        s1.shutdown()
        s2.shutdown()


def test_pipelined_drain_resolves_every_future():
    """Graceful drain with batches parked in the finisher queue: zero lost
    futures, all readbacks complete before shutdown returns."""
    fake = _OverlapPipe(compute_s=0.01, readback_s=0.1)
    s = InferenceServer(fake, max_batch=1, max_wait_ms=1.0, pipeline_depth=3)
    futs = [s.submit(GenerateRequest(f"p{i}", num_inference_steps=2))
            for i in range(5)]
    s.shutdown(wait=True, drain=True)
    outs = [f.result(timeout=1) for f in futs]  # resolved already
    assert len(outs) == 5 and all(o["image"].shape == (4, 4, 3) for o in outs)


def test_serving_sd3_family_end_to_end():
    """The server is family-agnostic: the SD3 (MMDiT rectified-flow)
    pipeline serves through the same batcher — coalescing, per-request RNG
    streams, and uint8 readback all apply unchanged."""
    from sonicdiffusionbayeslab_tpu.schedulers import FlowMatchEulerScheduler

    load_all_plugins()
    p3 = models_registry["stable_diffusion_3_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32"
    )
    p3.scheduler = FlowMatchEulerScheduler(shift=3.0)
    s = InferenceServer(p3, max_batch=4, max_wait_ms=100.0)
    try:
        futs = [s.submit(GenerateRequest(f"prompt {i}", num_inference_steps=3,
                                         guidance_scale=4.0))
                for i in range(4)]
        outs = [f.result(timeout=600) for f in futs]
        for o in outs:
            assert o["image"].shape == (16, 16, 3)
            assert np.isfinite(o["image"]).all()
        # determinism: same explicit seed + prompt -> identical image
        a = s.generate(GenerateRequest("same", num_inference_steps=3, seed=7),
                       timeout=600)
        b = s.generate(GenerateRequest("same", num_inference_steps=3, seed=7),
                       timeout=600)
        np.testing.assert_array_equal(a["image"], b["image"])
    finally:
        s.shutdown()


def test_serve_main_applies_acceleration_knobs(tmp_path, monkeypatch):
    """`sdbl-serve --config turbo-like.yaml` must serve the SAME stack the
    experiment path benchmarks: inference.quant / unet_microbatch,
    experiment_params.tome_ratio, and a scalar cache_interval all land on
    the pipeline before the worker starts (serving/server.py::main)."""
    import yaml

    from sonicdiffusionbayeslab_tpu.ops import quant as quant_mod
    from sonicdiffusionbayeslab_tpu.serving import server as server_mod

    cfg = {
        "experiment_name": "serve knobs",
        "experiment": {"method": "tome", "seed": 1},
        "model": {"model_name": "stable_diffusion_model",
                  "pretrained_model": "x", "tiny": True, "image_size": 64,
                  "dtype": "float32"},
        "scheduler": {"scheduler_name": "dpm_solver_scheduler"},
        "dataset": {"img_dataset": ".", "prompts": ".", "image_size": 64},
        "logger": {"wandb_enable": False, "save": False, "save_dir": "."},
        "inference": {"batch_size": 4, "quant": "int8_conv_only",
                      "unet_microbatch": 2},
        "experiment_params": {"tome_ratio": 0.5, "solver_order": 2,
                              "cache_interval": 3, "cache_branch_id": 1},
    }
    p = tmp_path / "turbo.yaml"
    p.write_text(yaml.safe_dump(cfg))

    captured = {}

    def fake_serve(pipe, name, *a, **kw):
        captured["pipe"] = pipe
        captured["quant"] = quant_mod.get_quant_mode()

    monkeypatch.setattr(server_mod, "serve", fake_serve)
    monkeypatch.setattr("sys.argv", ["sdbl-serve", "--config", str(p)])
    try:
        server_mod.main()
    finally:
        quant_mod.set_quant_mode(None)
    pipe = captured["pipe"]
    assert captured["quant"] == "int8_conv_only"
    assert pipe.unet_microbatch == 2
    assert pipe.tome_ratio == 0.5
    plan = pipe.cache_plan_fn(6)
    assert plan is not None  # interval-3 CachePlan over 6 steps
    assert pipe.scheduler.solver_order == 2


def test_serve_main_rejects_cache_sweep(tmp_path, monkeypatch):
    """A sweep-valued cache_interval is an experiment, not a serving point."""
    import yaml

    from sonicdiffusionbayeslab_tpu.serving import server as server_mod

    cfg = {
        "experiment_name": "bad", "experiment": {"method": "deep_cache", "seed": 1},
        "model": {"model_name": "stable_diffusion_model",
                  "pretrained_model": "x", "tiny": True, "image_size": 64,
                  "dtype": "float32"},
        "scheduler": {"scheduler_name": "dpm_solver_scheduler"},
        "dataset": {"img_dataset": ".", "prompts": ".", "image_size": 64},
        "logger": {"wandb_enable": False, "save": False, "save_dir": "."},
        "inference": {"batch_size": 4},
        "experiment_params": {"cache_interval": [2, 3, 5]},
    }
    p = tmp_path / "sweep.yaml"
    p.write_text(yaml.safe_dump(cfg))
    monkeypatch.setattr("sys.argv", ["sdbl-serve", "--config", str(p)])
    with pytest.raises(SystemExit, match="scalar"):
        server_mod.main()
