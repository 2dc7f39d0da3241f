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
from sonicdiffusionbayeslab_tpu.serving import GenerateRequest, InferenceServer


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
