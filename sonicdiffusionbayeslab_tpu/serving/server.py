"""Dependency-free HTTP front end for the micro-batching server.

    sdbl-serve --config configs/dpm_solver_config.yaml --port 8000

Endpoints:
  GET  /healthz  -> {"ok": true, "devices": N, "model": "..."}
  GET  /metrics  -> batcher counters (requests, images, batches, latency)
  POST /generate -> {"prompt": "...", "steps": 20, "guidance": 7.5,
                     "negative_prompt": "", "seed": null}
                 -> {"image_png_base64": "...", "execution_time": s,
                     "batch_size": n, "nfe": k}

One process, one device mesh, stdlib http.server (ThreadingHTTPServer) —
the threads only marshal JSON; all compute funnels through the batcher's
single worker so requests coalesce into full device batches.
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from sonicdiffusionbayeslab_tpu.serving.batcher import GenerateRequest, InferenceServer


def _png_b64(image: np.ndarray) -> str:
    from sonicdiffusionbayeslab_tpu.data.imageio import encode_png_bytes

    return base64.b64encode(encode_png_bytes(image)).decode("ascii")


def make_handler(server: InferenceServer, model_name: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._send(200, {"ok": True, "devices": len(jax.devices()),
                                 "model": model_name})
            elif self.path == "/metrics":
                s = dict(server.stats)
                s["mean_batch_seconds"] = (
                    s["batch_seconds"] / s["batches"] if s["batches"] else 0.0
                )
                self._send(200, s)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                seed = req.get("seed")
                if seed is not None:
                    seed = int(seed)
                g = GenerateRequest(
                    prompt=str(req["prompt"]),
                    num_inference_steps=int(req.get("steps", 20)),
                    guidance_scale=float(req.get("guidance", 7.5)),
                    negative_prompt=str(req.get("negative_prompt", "")),
                    seed=seed,
                    height=int(req["height"]) if req.get("height") else None,
                    width=int(req["width"]) if req.get("width") else None,
                )
                fut = server.submit(g)  # submit validates; errors are 400s
            except (KeyError, ValueError, TypeError, json.JSONDecodeError) as e:
                self._send(400, {"error": f"bad request: {e}"})
                return
            try:
                out = fut.result(timeout=600)
            except Exception as e:  # surfaced engine errors
                self._send(500, {"error": str(e)})
                return
            self._send(200, {
                "image_png_base64": _png_b64(out["image"]),
                "execution_time": out["execution_time"],
                "batch_size": out["batch_size"],
                "nfe": out["nfe"],
            })

    return Handler


def serve(pipe, model_name: str, host: str = "127.0.0.1", port: int = 8000,
          max_batch: int = 8, max_wait_ms: float = 25.0,
          pipeline_depth: int = 2,
          ready_event: Optional[threading.Event] = None):
    """Blocking serve loop; returns (httpd, inference_server) via the
    ready_event hook for tests."""
    inference = InferenceServer(pipe, max_batch=max_batch, max_wait_ms=max_wait_ms,
                                pipeline_depth=pipeline_depth)
    httpd = ThreadingHTTPServer((host, port), make_handler(inference, model_name))
    if ready_event is not None:
        ready_event.httpd = httpd  # type: ignore[attr-defined]
        ready_event.inference = inference  # type: ignore[attr-defined]
        ready_event.set()
    try:
        httpd.serve_forever()
    finally:
        inference.shutdown(wait=False)


def main() -> None:
    import argparse

    from sonicdiffusionbayeslab_tpu.config import load_config
    from sonicdiffusionbayeslab_tpu.registry import (
        load_all_plugins,
        models_registry,
        schedulers_registry,
    )
    from sonicdiffusionbayeslab_tpu.utils.compilation_cache import enable as enable_cache

    parser = argparse.ArgumentParser(description="SonicDiffusionBayesLab-TPU server")
    parser.add_argument("--config", required=True,
                        help="experiment YAML: model + scheduler sections are used")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--max_wait_ms", type=float, default=25.0)
    parser.add_argument("--pipeline_depth", type=int, default=2,
                        help="overlapped batches: worker dispatches batch N+1 "
                             "while batch N's decode/readback finishes (1 = serial)")
    parser.add_argument("--mesh_data", type=int, default=0,
                        help="data-parallel mesh axis (0 = single device)")
    parser.add_argument("--mesh_seq", type=int, default=1)
    parser.add_argument("--mesh_model", type=int, default=1)
    args = parser.parse_args()

    enable_cache()
    load_all_plugins()
    cfg = load_config(args.config)
    mcfg = dict(cfg.model)
    name = mcfg.pop("model_name")
    mcfg.setdefault("image_size", cfg.dataset.get("image_size", 512))
    if args.mesh_data or args.mesh_seq > 1 or args.mesh_model > 1:
        mcfg.update(mesh_data=args.mesh_data, mesh_seq=args.mesh_seq,
                    mesh_model=args.mesh_model)
    pipe = models_registry[name](**mcfg)
    sname = cfg.get("scheduler", {}).get("scheduler_name", "dpm_solver_scheduler")
    # Scheduler kwargs flow from experiment_params exactly like the
    # experiment path (experiments/base.py::build_scheduler) — serving an
    # SD-2.1 v_prediction config with epsilon rows would produce garbage.
    import inspect

    ep = dict(cfg.get("experiment_params", {}) or {})
    accepted = set(inspect.signature(schedulers_registry[sname].__init__).parameters)
    skw = {k: v for k, v in ep.items() if k in accepted}
    pipe.scheduler = schedulers_registry[sname](**skw)
    if skw:
        print(f"scheduler kwargs from experiment_params: {skw}")
    # Acceleration knobs flow from the SAME config keys as the experiment
    # path, so a turbo/deep_cache YAML serves the stack it benchmarks:
    # inference.quant / inference.unet_microbatch (experiments/base.py:73,
    # sampler microbatch), experiment_params.tome_ratio (TomeMethod), and
    # experiment_params.cache_interval/cache_branch_id (DeepCacheMethod —
    # scalar here: serving runs ONE operating point, not a sweep).
    inf = cfg.get("inference", {}) or {}
    if inf.get("quant") is not None:
        from sonicdiffusionbayeslab_tpu.ops.quant import set_quant_mode

        set_quant_mode(str(inf["quant"]).lower() or None)
        print(f"quant mode: {inf['quant']}")
    if inf.get("unet_microbatch") is not None:
        pipe.unet_microbatch = int(inf["unet_microbatch"])
    if ep.get("tome_ratio") is not None:
        pipe.tome_ratio = float(ep["tome_ratio"])
        print(f"token merging: ratio {pipe.tome_ratio}")
    ci = ep.get("cache_interval")
    if ci is not None:
        if isinstance(ci, (list, tuple)):
            raise SystemExit(
                "serving needs a scalar experiment_params.cache_interval "
                f"(one operating point), got sweep {ci!r}")
        from sonicdiffusionbayeslab_tpu.models.sampler import CachePlan

        interval, branch = int(ci), int(ep.get("cache_branch_id", 0))
        pipe.cache_plan_fn = lambda n: CachePlan.every(n, interval, branch)
        print(f"deep cache: interval {interval}, branch {branch}")
    print(f"serving {name} ({sname}) on http://{args.host}:{args.port}")
    serve(pipe, name, args.host, args.port, args.max_batch, args.max_wait_ms,
          args.pipeline_depth)


if __name__ == "__main__":
    main()
