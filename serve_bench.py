"""Serving hardware receipts (VERDICT r3 #5 -> docs/SERVING.md).

End-to-end serving throughput on the attached chip — InferenceServer with
its production defaults (pipeline_depth 2, uint8 device-side readback),
N concurrent requests, e2e wall clock from first submit to last future.
Text encode + denoise + VAE decode + host readback all included (this is
the number a deployment sees, unlike bench.py's loop-only protocol).

Modes (one JSON line each):

  python serve_bench.py hero        # SD-1.5 512px exact bf16, round-3 defaults
  python serve_bench.py turbo       # + int8 conv quant + ToMe 0.5
  python serve_bench.py deep_cache  # + DeepCache interval 3 (exact levers off)
  python serve_bench.py max_stack   # turbo + DeepCache 3
  python serve_bench.py sdxl        # SDXL-base 1024px exact
  python serve_bench.py sd3         # SD3-medium 1024px flow-match exact

Env: SDBL_SERVE_REQUESTS (default per mode), SDBL_SERVE_MAXBATCH,
SDBL_SERVE_DEPTH (default 2).  Protocol: one full-batch warm pass to
compile (excluded), then the measured pass.  Weights are deterministic
random — same compiled graphs/shapes as real checkpoints, which is what
throughput depends on.
"""

import json
import os
import sys
import time

import numpy as np


PROMPT = "a man on a snowboard coming down a slope"
TINY = bool(int(os.environ.get("SDBL_SERVE_TINY", "0")))  # CPU smoke only


def _build_pipe(mode):
    from sonicdiffusionbayeslab_tpu.models.sampler import CachePlan
    from sonicdiffusionbayeslab_tpu.registry import (
        load_all_plugins,
        models_registry,
        schedulers_registry,
    )

    load_all_plugins()
    if mode in ("hero", "turbo", "deep_cache", "max_stack"):
        pipe = models_registry["stable_diffusion_model"](
            pretrained_model="x", image_size=512, dtype="bfloat16", tiny=TINY)
        pipe.scheduler = schedulers_registry["dpm_solver_scheduler"](solver_order=2)
        if not TINY:
            pipe.unet_microbatch = 4  # the batch-32 memory fix (docs/PERF.md)
        max_batch, requests, steps = 32, 128, 20
    elif mode == "sdxl":
        pipe = models_registry["stable_diffusion_xl_model"](
            pretrained_model="x", image_size=1024, dtype="bfloat16", tiny=TINY)
        pipe.scheduler = schedulers_registry["dpm_solver_scheduler"](solver_order=2)
        max_batch, requests, steps = 4, 16, 20
    elif mode == "sd3":
        pipe = models_registry["stable_diffusion_3_model"](
            pretrained_model="x", image_size=1024, dtype="bfloat16", tiny=TINY)
        pipe.scheduler = schedulers_registry["flow_match_euler_scheduler"]()
        if not TINY:
            pipe.unet_microbatch = 2  # MMDiT 1024px memory point (docs/PERF.md)
        max_batch, requests, steps = 4, 16, 20
    else:
        raise SystemExit(f"unknown mode {mode!r}")
    if TINY:
        max_batch, requests, steps = 4, 8, 3

    if mode in ("turbo", "max_stack"):
        from sonicdiffusionbayeslab_tpu.ops.quant import set_quant_mode

        set_quant_mode("int8_conv_only")
        pipe.tome_ratio = 0.5
    if mode in ("deep_cache", "max_stack"):
        pipe.cache_plan_fn = lambda n: CachePlan.every(n, 3, 0)
    return pipe, max_batch, requests, steps


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "hero"
    from sonicdiffusionbayeslab_tpu.serving import GenerateRequest, InferenceServer
    from sonicdiffusionbayeslab_tpu.utils.compilation_cache import enable as _cache

    _cache()
    pipe, max_batch, requests, steps = _build_pipe(mode)
    max_batch = int(os.environ.get("SDBL_SERVE_MAXBATCH", max_batch))
    requests = int(os.environ.get("SDBL_SERVE_REQUESTS", requests))
    depth = int(os.environ.get("SDBL_SERVE_DEPTH", "2"))
    guidance = 7.5 if mode != "sd3" else 5.0

    srv = InferenceServer(pipe, max_batch=max_batch, max_wait_ms=25.0,
                          max_pending=max(256, 2 * requests),
                          pipeline_depth=depth)
    try:
        # Warm pass: one full batch -> compile (cache-persisted).
        warm = [srv.submit(GenerateRequest(PROMPT, num_inference_steps=steps,
                                           guidance_scale=guidance, seed=i))
                for i in range(max_batch)]
        t0 = time.perf_counter()
        for f in warm:
            f.result(timeout=3600)
        warm_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        futs = [srv.submit(GenerateRequest(PROMPT, num_inference_steps=steps,
                                           guidance_scale=guidance, seed=1000 + i))
                for i in range(requests)]
        for f in futs:
            img = f.result(timeout=3600)["image"]
        elapsed = time.perf_counter() - t0
        assert np.isfinite(np.asarray(img, np.float32)).all()
    finally:
        srv.shutdown(drain=False)

    img_h = requests / elapsed * 3600.0
    print(json.dumps({
        "metric": f"serve_{mode}",
        "value": round(img_h, 1),
        "unit": "images/hour e2e",
        "requests": requests,
        "max_batch": max_batch,
        "pipeline_depth": depth,
        "steps": steps,
        "elapsed_s": round(elapsed, 2),
        "warm_pass_s": round(warm_s, 1),
        "batches": srv.stats["batches"],
    }))


if __name__ == "__main__":
    main()
