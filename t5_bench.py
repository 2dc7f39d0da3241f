"""Staged-T5 hardware receipts (VERDICT r4 #3 -> docs/MODELS.md).

Executes `use_t5: true` at REAL SD3-medium geometry (T5-XXL 4.7B tower,
MMDiT-medium, 1024px) on the attached chip, via the product pipeline path
(StableDiffusion3Model), and answers the two questions docs/MODELS.md's
arithmetic previously only asserted:

  python t5_bench.py staged    # host-resident T5, transfer->encode->free
  python t5_bench.py resident  # the control: everything on-device at once

`staged` emits: host-init seconds (one-time), host->device transfer +
encode seconds per batch, denoise-loop img/h, e2e img/h.  `resident` at
this geometry is expected to RESOURCE_EXHAUST (9.5 GB T5 + 4.1 GB MMDiT
+ CLIPs + activations > 15.75 GB HBM) — the receipt records fits:no with
the error class instead of crashing.  The axon tunnel reports no
memory_stats, so fits? is proven by execution, not a byte counter.

Weights are deterministic random — identical compiled graphs/shapes as a
real snapshot (bench.py protocol).  Reference counterpart: the text
conditioning path at /root/reference/src/models.py:139-155, scaled to the
repo's SD3 family (beyond-reference).
"""

import json
import sys
import time

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "staged"
    if mode not in ("staged", "resident"):
        raise SystemExit(f"unknown mode {mode!r} (staged|resident)")

    from sonicdiffusionbayeslab_tpu.registry import (
        load_all_plugins,
        models_registry,
        schedulers_registry,
    )
    from sonicdiffusionbayeslab_tpu.utils.compilation_cache import enable as _cache

    _cache()
    load_all_plugins()

    batch, steps = 4, 20
    prompts = ["a man on a snowboard coming down a slope"] * batch

    t0 = time.perf_counter()
    try:
        pipe = models_registry["stable_diffusion_3_model"](
            pretrained_model="x", image_size=1024, dtype="bfloat16",
            use_t5=True, t5_staged=(mode == "staged"))
        pipe.scheduler = schedulers_registry["flow_match_euler_scheduler"]()
        pipe.unet_microbatch = 2  # MMDiT 1024px memory point (docs/PERF.md)
        init_s = time.perf_counter() - t0

        # Warm pass (compile, excluded).
        imgs, _, _ = pipe(prompts, num_inference_steps=steps, guidance_scale=5.0,
                          seed=0)
        assert np.isfinite(np.asarray(imgs, np.float32)).all()

        # Encode phase alone: host->device T5 transfer + triple-tower encode
        # (staged mode re-transfers per batch; the sample phase then frees it).
        t0 = time.perf_counter()
        ctx = pipe._encode(prompts)
        ctx.block_until_ready()
        encode_s = time.perf_counter() - t0
        pipe._pooled_queue.clear()
        if mode == "staged":
            pipe._release_t5()

        # Measured e2e passes.
        e2e, loop = [], []
        for r in range(3):
            t0 = time.perf_counter()
            imgs, exec_time, _ = pipe(prompts, num_inference_steps=steps,
                                      guidance_scale=5.0, seed=1 + r)
            np.asarray(imgs)
            e2e.append(time.perf_counter() - t0)
            loop.append(float(exec_time))
        sec_img_loop = min(loop) / batch
        sec_img_e2e = min(e2e) / batch
        print(json.dumps({
            "metric": f"t5_{mode}",
            "fits": True,
            "value": round(3600.0 / sec_img_loop, 1),
            "unit": "images/hour loop-only",
            "img_per_hour_e2e": round(3600.0 / sec_img_e2e, 1),
            "encode_phase_s_per_batch": round(encode_s, 2),
            "init_s": round(init_s, 1),
            "batch": batch,
            "steps": steps,
        }))
    except Exception as e:  # RESOURCE_EXHAUSTED is the expected resident outcome
        msg = f"{type(e).__name__}: {e}"
        if "RESOURCE_EXHAUSTED" not in msg and "Resource exhausted" not in msg.lower():
            raise
        print(json.dumps({
            "metric": f"t5_{mode}",
            "fits": False,
            "error": msg.splitlines()[0][:300],
        }))


if __name__ == "__main__":
    main()
