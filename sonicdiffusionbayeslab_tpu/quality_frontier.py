"""One-command speed-vs-quality frontier over the whole acceleration zoo.

The reference's entire point is the speed/quality trade-off — its
deep_cache config sweeps ``cache_interval x num_inference_steps`` and
scores every point with CLIP (reference configs/deep_cache_config.yaml:29-32,
src/metrics/metrics.py:25-41).  This tool applies that protocol to every
acceleration mode this framework ships, in ONE run, the day real weights
land (environment-gated: no hub access here, so it needs local snapshots):

    sdbl-frontier --sd15 /path/to/stable-diffusion-v1-5 \\
                  --clip /path/to/clip-vit-base-patch16 \\
                  [--sd3 /path/to/stable-diffusion-3-medium] \\
                  [--prompts 100 --batch 8 --steps 20] \\
                  [--out outputs/frontier]

Measured per mode: loop-only sec/image (reference protocol,
src/models.py:208,284-285), images/hour/chip, CLIP score on COCO test
captions, and the deltas vs the exact bf16 baseline.  Output: one TSV +
JSONL table (the BASELINE.json CLIP gate is the exact row's score; every
approximate row quantifies the quality cost its PERF.md speedup was
paper-cited for).

SD-1.5 modes swept: exact bf16; ToMe {0.25, 0.5}; int8_conv_only;
turbo (int8_conv_only + ToMe 0.5); DeepCache interval {2, 3, 5};
max-stack (turbo + DeepCache 3).  SD3 modes (with --sd3): exact;
trunk-delta cache interval {2, 3}.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from pathlib import Path
from typing import List, Optional, Sequence


@dataclasses.dataclass
class Mode:
    label: str
    family: str  # sd15 | sd3
    call_kw: dict = dataclasses.field(default_factory=dict)
    quant: Optional[str] = None
    cache_interval: int = 0
    cache_branch: int = 0


SD15_MODES = [
    Mode("exact_bf16", "sd15"),
    Mode("tome_0.25", "sd15", {"tome_ratio": 0.25}),
    Mode("tome_0.5", "sd15", {"tome_ratio": 0.5}),
    Mode("int8_conv_only", "sd15", quant="int8_conv_only"),
    Mode("turbo(int8+tome0.5)", "sd15", {"tome_ratio": 0.5}, quant="int8_conv_only"),
    Mode("deep_cache_2", "sd15", cache_interval=2),
    Mode("deep_cache_3", "sd15", cache_interval=3),
    Mode("deep_cache_5", "sd15", cache_interval=5),
    Mode("max_stack(turbo+dc3)", "sd15", {"tome_ratio": 0.5},
         quant="int8_conv_only", cache_interval=3),
]

SD3_MODES = [
    Mode("sd3_exact_bf16", "sd3"),
    Mode("sd3_trunk_delta_2", "sd3", cache_interval=2, cache_branch=2),
    Mode("sd3_trunk_delta_3", "sd3", cache_interval=3, cache_branch=2),
    # Round-5 MMDiT levers (docs/PERF.md "SD3 approximate levers"):
    # DiT-ToMe merges image tokens around the joint attention
    # (models/mmdit.py MMDiTBlock); int8 W8A8 hits every MMDiT
    # projection/FFN via projection_dense (ops/quant.py).
    Mode("sd3_tome_0.25", "sd3", {"tome_ratio": 0.25}),
    Mode("sd3_tome_0.5", "sd3", {"tome_ratio": 0.5}),
    Mode("sd3_int8", "sd3", quant="int8"),
    Mode("sd3_max_stack(tome0.5+td3)", "sd3", {"tome_ratio": 0.5},
         cache_interval=3, cache_branch=2),
]


def coco_prompts(n: int) -> List[str]:
    p = Path(__file__).resolve().parent / "data/dataset/img2annotations_test.json"
    if not p.exists():  # installed layout: data/ at repo root
        p = Path(__file__).resolve().parents[1] / "data/dataset/img2annotations_test.json"
    ann = json.loads(p.read_text())
    caps = [v for _, v in sorted(ann.items())]
    return caps[:n]


def _build_pipe(family: str, snapshot: str, batch: int, steps: int, microbatch):
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    if family == "sd3":
        from sonicdiffusionbayeslab_tpu.schedulers import FlowMatchEulerScheduler

        pipe = models_registry["stable_diffusion_3_model"](pretrained_model=snapshot)
        pipe.scheduler = FlowMatchEulerScheduler(shift=3.0)
    else:
        from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

        pipe = models_registry["stable_diffusion_model"](pretrained_model=snapshot)
        pipe.scheduler = DPMSolverScheduler(solver_order=2)
    pipe.unet_microbatch = microbatch
    return pipe


def run_mode(pipe, mode: Mode, prompts: Sequence[str], batch: int, steps: int,
             guidance: float, clip_metric) -> dict:
    import numpy as np

    from sonicdiffusionbayeslab_tpu.models.sampler import CachePlan
    from sonicdiffusionbayeslab_tpu.ops.quant import set_quant_mode

    set_quant_mode(mode.quant)
    pipe.cache_plan_fn = (
        (lambda n, m=mode: CachePlan.every(n, m.cache_interval, m.cache_branch))
        if mode.cache_interval >= 2 else None
    )
    try:
        total_time, n_img = 0.0, 0
        if clip_metric is not None:
            clip_metric.reset()
        for i in range(0, len(prompts), batch):
            chunk = list(prompts[i:i + batch])
            imgs, t, _ = pipe(chunk, num_inference_steps=steps,
                              guidance_scale=guidance, **mode.call_kw)
            total_time += float(t)
            n_img += len(chunk)
            if clip_metric is not None:
                clip_metric.update(np.asarray(imgs, np.float32), chunk)
        sec_per_image = total_time / n_img
        row = {
            "mode": mode.label,
            "family": mode.family,
            "nfe": int(pipe.num_timesteps),
            "sec_per_image": round(sec_per_image, 4),
            "images_per_hour": round(3600.0 / sec_per_image, 1),
            "clip_score": (round(float(clip_metric.compute()), 4)
                           if clip_metric is not None else None),
        }
        return row
    finally:
        set_quant_mode(None)
        pipe.cache_plan_fn = None


def main(argv: Optional[Sequence[str]] = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--sd15", default=os.environ.get("SDBL_SD15_SNAPSHOT"),
                    help="local diffusers SD-1.5 snapshot dir")
    ap.add_argument("--clip", default=os.environ.get("SDBL_CLIP_SNAPSHOT"),
                    help="local clip-vit-base-patch16 snapshot (CLIP scoring; "
                         "omit to measure speed only)")
    ap.add_argument("--sd3", default=os.environ.get("SDBL_SD3_SNAPSHOT"),
                    help="local SD3-medium snapshot dir (adds the SD3 rows)")
    ap.add_argument("--prompts", type=int, default=100,
                    help="COCO test captions per mode (reference protocol: 1000)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sd3-batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--guidance", type=float, default=7.5)
    ap.add_argument("--microbatch", type=int, default=None,
                    help="unet_microbatch (None = off at batch<=8)")
    ap.add_argument("--out", default="outputs/frontier",
                    help="output prefix (.tsv + .jsonl written)")
    args = ap.parse_args(argv)

    if not args.sd15:
        ap.error("--sd15 (or SDBL_SD15_SNAPSHOT) is required — this tool is "
                 "environment-gated on a local snapshot (no hub access)")

    prompts = coco_prompts(args.prompts)
    clip_metric = None
    if args.clip:
        from sonicdiffusionbayeslab_tpu.metrics.metrics import ClipScoreMetric

        clip_metric = ClipScoreMetric(model_name_or_path=args.clip)

    rows = []
    pipe = _build_pipe("sd15", args.sd15, args.batch, args.steps, args.microbatch)
    for mode in SD15_MODES:
        row = run_mode(pipe, mode, prompts, args.batch, args.steps,
                       args.guidance, clip_metric)
        rows.append(row)
        print(json.dumps(row), flush=True)
    del pipe

    if args.sd3:
        pipe3 = _build_pipe("sd3", args.sd3, args.sd3_batch, args.steps, None)
        for mode in SD3_MODES:
            row = run_mode(pipe3, mode, prompts, args.sd3_batch, args.steps,
                           7.0, clip_metric)
            rows.append(row)
            print(json.dumps(row), flush=True)

    base = {r["family"]: r for r in rows if r["mode"].endswith("exact_bf16")}
    for r in rows:
        b = base.get(r["family"])
        if b:
            r["speedup_vs_exact"] = round(b["sec_per_image"] / r["sec_per_image"], 3)
            if r["clip_score"] is not None and b["clip_score"]:
                r["clip_delta_pct"] = round(
                    100.0 * (r["clip_score"] - b["clip_score"]) / b["clip_score"], 3)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    cols = ["mode", "family", "nfe", "sec_per_image", "images_per_hour",
            "clip_score", "speedup_vs_exact", "clip_delta_pct"]
    with open(f"{out}.tsv", "w") as f:
        f.write("\t".join(cols) + "\n")
        for r in rows:
            f.write("\t".join(str(r.get(c, "")) for c in cols) + "\n")
    with open(f"{out}.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"frontier written: {out}.tsv / {out}.jsonl", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
