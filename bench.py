"""Flagship benchmark: SD-1.5 512x512 @ 20-step DPM-Solver++ (the
BASELINE.json hero config) on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 2000 images/hour/chip (BASELINE.md).
Timing follows the reference protocol — denoise-loop wall clock only,
excluding text encode and VAE decode (reference src/models.py:208,284-285).

Weights are deterministic random (no hub access in this environment): the
compute graph, shapes and dtypes are exactly the SD-1.5 ones, which is what
throughput depends on.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from sonicdiffusionbayeslab_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    quick = "--quick" in sys.argv
    on_tpu = jax.default_backend() == "tpu"

    from sonicdiffusionbayeslab_tpu.models import (
        CLIPTextConfig,
        StableDiffusionEngine,
        UNetConfig,
        VAEConfig,
    )
    from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
    from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

    bench_model = os.environ.get("SDBL_BENCH_MODEL", "").lower()
    sdxl = bench_model == "sdxl"
    if on_tpu and not quick and bench_model == "sd3":
        # Secondary benchmark (docs/PERF.md): SD3-medium geometry (MMDiT
        # depth 24 / hidden 1536, 16-ch VAE) at 1024px, 20-step flow-match
        # Euler.  SDBL_BENCH_CACHE_INTERVAL >= 2 adds trunk-delta caching
        # (models/mmdit.py) at split depth SDBL_BENCH_CACHE_BRANCH.
        from sonicdiffusionbayeslab_tpu.models.sampler import CachePlan
        from sonicdiffusionbayeslab_tpu.models.sd3 import SD3Engine
        from sonicdiffusionbayeslab_tpu.schedulers import FlowMatchEulerScheduler

        batch = int(os.environ.get("SDBL_BENCH_BATCH", "4"))
        engine = SD3Engine(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        params = engine.init_params(seed=0, latent_hw=128)
        tok1 = HashTokenizer(vocab_size=engine.text_config.vocab_size,
                             max_length=engine.text_config.max_length)
        tok2 = HashTokenizer(vocab_size=engine.text2_config.vocab_size,
                             max_length=engine.text2_config.max_length)
        prompts = ["a man on a snowboard coming down a slope"] * batch
        ctx, pooled = engine.encode_prompts_sd3(params, tok1(prompts), tok2(prompts))
        nctx, npooled = engine.encode_prompts_sd3(params, tok1([""] * batch),
                                                  tok2([""] * batch))
        added = {"text_embeds": pooled, "negative_text_embeds": npooled,
                 "time_ids": jnp.zeros((batch, 6), jnp.float32)}
        steps = 20
        plan = FlowMatchEulerScheduler(shift=3.0).build_plan(steps)
        interval = int(os.environ.get("SDBL_BENCH_CACHE_INTERVAL", "0"))
        branch = int(os.environ.get("SDBL_BENCH_CACHE_BRANCH", "2"))
        cache_plan = (CachePlan.every(steps, interval, branch)
                      if interval >= 2 else None)
        # Round-5 MMDiT levers (docs/PERF.md "SD3 approximate levers"):
        # SDBL_BENCH_TOME=<ratio> merges image tokens around the joint
        # attention (DiT-ToMe, models/mmdit.py); SDBL_BENCH_QUANT=int8
        # W8A8-quantizes every MMDiT projection/FFN (ops/quant.py).
        tome = float(os.environ.get("SDBL_BENCH_TOME", "0") or 0) or None
        if os.environ.get("SDBL_BENCH_QUANT"):
            from sonicdiffusionbayeslab_tpu.ops.quant import set_quant_mode

            set_quant_mode(os.environ["SDBL_BENCH_QUANT"])
        key = jax.random.PRNGKey(29)
        # Micro-batching is REQUIRED at this geometry: the CFG-doubled
        # batch through 24 joint-attention blocks at N ~ 4250 tokens OOMs
        # HBM un-chunked (26.3G vs 15.75G measured) — chunks of 2 keep the
        # per-step working set bounded, output-identical (docs/PERF.md).
        mb_env = os.environ.get("SDBL_BENCH_MICROBATCH", "")
        microbatch = int(mb_env) if mb_env else batch  # chunks of 2 (CFG-doubled)
        kw = dict(latent_hw=(128, 128), guidance_scale=7.0, decode=False,
                  added_cond=added, cache_plan=cache_plan, microbatch=microbatch,
                  tome=tome)
        engine.sample(params, plan, ctx, nctx, key, **kw)  # warm-up/compile
        times = []
        for r in range(3):
            out = engine.sample(params, plan, ctx, nctx, jax.random.fold_in(key, r), **kw)
            times.append(out.execution_time)
        sec_per_image = min(times) / batch
        cache_tag = f", cache {interval}/b{branch}" if cache_plan else ""
        if tome:
            cache_tag += f", tome {tome}"
        if os.environ.get("SDBL_BENCH_QUANT"):
            cache_tag += f", quant {os.environ['SDBL_BENCH_QUANT']}"
        print(json.dumps({
            "metric": (f"images/hour/chip SD3-medium 1024px @20-step "
                       f"FlowMatchEuler (loop-only, batch {batch}{cache_tag})"),
            "value": round(3600.0 / sec_per_image, 1),
            "unit": "images/hour/chip",
            "vs_baseline": round(3600.0 / sec_per_image / 2000.0, 3),
        }))
        return

    if on_tpu and not quick and sdxl:
        # Secondary benchmark (docs/PERF.md): SDXL-base geometry at 1024px.
        # The driver's recorded metric stays the SD-1.5 hero config below.
        from sonicdiffusionbayeslab_tpu.models import SDXLEngine, SDXLTextConfigs

        batch = int(os.environ.get("SDBL_BENCH_BATCH", "4"))
        engine = SDXLEngine(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
        params = engine.init_params(seed=0, latent_hw=128)
        tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
        tok2 = HashTokenizer(vocab_size=engine.text2_config.vocab_size)
        prompts = ["a man on a snowboard coming down a slope"] * batch
        ctx, pooled = engine.encode_prompts_xl(params, tok(prompts), tok2(prompts))
        nctx, npooled = engine.encode_prompts_xl(params, tok([""] * batch), tok2([""] * batch))
        added = {
            "text_embeds": pooled, "negative_text_embeds": npooled,
            "time_ids": jnp.tile(
                jnp.asarray([[1024., 1024., 0., 0., 1024., 1024.]], jnp.float32),
                (batch, 1),
            ),
        }
        plan = DPMSolverScheduler(solver_order=2).build_plan(20)
        key = jax.random.PRNGKey(29)
        kw = dict(latent_hw=(128, 128), guidance_scale=7.5, decode=False,
                  added_cond=added)
        engine.sample(params, plan, ctx, nctx, key, **kw)  # warm-up/compile
        times = []
        for r in range(3):
            out = engine.sample(params, plan, ctx, nctx, jax.random.fold_in(key, r), **kw)
            times.append(out.execution_time)
        sec_per_image = min(times) / batch
        print(json.dumps({
            "metric": f"images/hour/chip SDXL 1024px @20-step DPM-Solver++ (loop-only, batch {batch})",
            "value": round(3600.0 / sec_per_image, 1),
            "unit": "images/hour/chip",
            "vs_baseline": round(3600.0 / sec_per_image / 2000.0, 3),
        }))
        return

    if on_tpu and not quick:
        unet_cfg, vae_cfg, text_cfg = UNetConfig.sd15(), VAEConfig.sd15(), CLIPTextConfig.sd15()
        # Batch 64 + unet_microbatch 8: the measured-best EXACT operating
        # point (docs/PERF.md batch sweep — each UNet chunk is the batch-8
        # sweet-spot program, fixed per-step overhead amortized over 8x the
        # images; output-identical to unchunked, +3.4% over batch 8).
        latent_hw, batch = 64, int(os.environ.get("SDBL_BENCH_BATCH", "64"))
        tag = "SD-1.5 512px"
    else:  # CPU smoke fallback — geometry scaled down, still the same graph.
        unet_cfg, vae_cfg, text_cfg = UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny()
        latent_hw, batch = 8, 2
        tag = "tiny (non-TPU fallback)"

    engine = StableDiffusionEngine(unet_cfg, vae_cfg, text_cfg,
                                   dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    params = engine.init_params(seed=0, latent_hw=latent_hw)
    tok = HashTokenizer(vocab_size=text_cfg.vocab_size, max_length=text_cfg.max_length)
    prompts = ["a man on a snowboard coming down a slope"] * batch
    embeds = engine.encode_prompts(params, tok(prompts))
    neg = engine.encode_prompts(params, tok([""] * batch))

    plan = DPMSolverScheduler(solver_order=2).build_plan(20)
    key = jax.random.PRNGKey(29)
    mb_env = os.environ.get("SDBL_BENCH_MICROBATCH", "")
    microbatch = int(mb_env) if mb_env else (batch // 8 if batch >= 16 else None)
    kw = dict(latent_hw=(latent_hw, latent_hw), guidance_scale=7.5, decode=False,
              microbatch=microbatch)

    # Warm-up / compile.
    engine.sample(params, plan, embeds, neg, key, **kw)

    reps = 1 if (quick or not on_tpu) else 3
    times = []
    for r in range(reps):
        out = engine.sample(params, plan, embeds, neg, jax.random.fold_in(key, r), **kw)
        times.append(out.execution_time)
    sec_per_image = min(times) / batch
    images_per_hour = 3600.0 / sec_per_image

    print(json.dumps({
        "metric": f"images/hour/chip {tag} @20-step DPM-Solver++ (loop-only, batch {batch})",
        "value": round(images_per_hour, 1),
        "unit": "images/hour/chip",
        "vs_baseline": round(images_per_hour / 2000.0, 3),
    }))


if __name__ == "__main__":
    main()
