"""The real-weights quality gate, as executable code (VERDICT r2 #10).

Environment-gated: every quality number in the receipts so far is a
random-weight run because this environment has no HF hub access (SURVEY §6;
the reference's operative path is ``from_pretrained(..., fp16)`` at
/root/reference/src/experiments/base_experiment.py:57-63).  The converters,
tokenizer and orbax cache are ready and round-trip-tested — this test is the
missing last mile, runnable the day a snapshot lands:

    SDBL_SD15_SNAPSHOT=/path/to/stable-diffusion-v1-5 \
    SDBL_CLIP_SNAPSHOT=/path/to/clip-vit-base-patch16 \
    python -m pytest tests/test_real_weights_gate.py -v

Gate: 8 COCO test-split captions (the reference's eval prompts,
data/dataset/img2annotations_test.json), 512px, 20-step DPM-Solver++ order
2, CFG 7.5, seed 29 — scored with the real CLIP tower.  Passing bar:
mean CLIP score >= SDBL_SD15_EXPECTED_CLIP * 0.995 (the BASELINE.json
"within 0.5%" criterion).  The default expected value 31.0 is the
well-established SD-1.5 COCO operating point for clip-vit-base-patch16;
override with the measured HF-diffusers number once one exists (the
reference repo publishes none — BASELINE.json "published": {}).
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

SNAPSHOT = os.environ.get("SDBL_SD15_SNAPSHOT")
CLIP_SNAPSHOT = os.environ.get("SDBL_CLIP_SNAPSHOT")

pytestmark = pytest.mark.skipif(
    not SNAPSHOT,
    reason="real-weights gate needs SDBL_SD15_SNAPSHOT=<local diffusers "
    "SD-1.5 snapshot dir> (no hub access in this environment)",
)


def _coco_prompts(n):
    p = Path(__file__).resolve().parents[1] / "data/dataset/img2annotations_test.json"
    ann = json.loads(p.read_text())
    return [v for _, v in sorted(ann.items())][:n]


@pytest.fixture(scope="module")
def real_pipe():
    import jax.numpy as jnp

    from sonicdiffusionbayeslab_tpu.models import (
        CLIPTextConfig,
        StableDiffusionEngine,
        UNetConfig,
        VAEConfig,
    )
    from sonicdiffusionbayeslab_tpu.models.tokenizer import CLIPBPETokenizer
    from sonicdiffusionbayeslab_tpu.models.weights import load_sd_checkpoint

    engine = StableDiffusionEngine(
        UNetConfig.sd15(), VAEConfig.sd15(), CLIPTextConfig.sd15(),
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    params = load_sd_checkpoint(SNAPSHOT, engine)
    tok_dir = Path(SNAPSHOT) / "tokenizer"
    tok = CLIPBPETokenizer(str(tok_dir / "vocab.json"), str(tok_dir / "merges.txt"))
    return engine, params, tok


def test_convert_and_20step_dpm(real_pipe):
    """Convert -> 20-step DPM++ -> finite images at 512px (the BASELINE.json
    hero config) with the real checkpoint."""
    import jax

    from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

    engine, params, tok = real_pipe
    prompts = _coco_prompts(4)
    embeds = engine.encode_prompts(params, tok(prompts))
    neg = engine.encode_prompts(params, tok([""] * len(prompts)))
    plan = DPMSolverScheduler(solver_order=2).build_plan(20)
    out = engine.sample(params, plan, embeds, neg, jax.random.PRNGKey(29),
                        guidance_scale=7.5, latent_hw=(64, 64))
    imgs = np.asarray(out.images)
    assert imgs.shape == (4, 512, 512, 3)
    assert np.isfinite(imgs).all()
    # Real weights produce structured images: per-image std well above the
    # gray-noise floor random weights give.
    assert float(imgs.std()) > 0.05


@pytest.mark.skipif(
    not CLIP_SNAPSHOT,
    reason="CLIP gate additionally needs SDBL_CLIP_SNAPSHOT=<local "
    "clip-vit-base-patch16 snapshot> for real scoring",
)
def test_clip_score_gate(real_pipe):
    """The north-star gate: CLIP score on COCO captions within 0.5% of the
    expected HF-diffusers operating point (BASELINE.json criterion)."""
    import jax

    from sonicdiffusionbayeslab_tpu.metrics.metrics import ClipScoreMetric
    from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

    engine, params, tok = real_pipe
    prompts = _coco_prompts(8)
    embeds = engine.encode_prompts(params, tok(prompts))
    neg = engine.encode_prompts(params, tok([""] * len(prompts)))
    plan = DPMSolverScheduler(solver_order=2).build_plan(20)
    out = engine.sample(params, plan, embeds, neg, jax.random.PRNGKey(29),
                        guidance_scale=7.5, latent_hw=(64, 64))

    metric = ClipScoreMetric(model_name_or_path=CLIP_SNAPSHOT)
    metric.update(np.asarray(out.images, np.float32), prompts)
    score = float(metric.compute())

    expected = float(os.environ.get("SDBL_SD15_EXPECTED_CLIP", "31.0"))
    assert score >= expected * 0.995, (
        f"CLIP {score:.3f} below the 0.5% gate vs expected {expected:.3f} "
        "(set SDBL_SD15_EXPECTED_CLIP to the measured HF-diffusers value)"
    )


def test_quality_frontier_one_command():
    """The full speed-vs-quality frontier (quality_frontier.py): exact +
    every approximate mode (ToMe {0.25,0.5}, int8_conv_only, DeepCache
    {2,3,5}, turbo, max-stack — plus SD3 trunk-delta {2,3} when
    SDBL_SD3_SNAPSHOT is set), CLIP-scored, in one command:

        sdbl-frontier --sd15 $SDBL_SD15_SNAPSHOT --clip $SDBL_CLIP_SNAPSHOT

    This executes a reduced run (8 prompts) to keep the gate fast; the
    shipped protocol default is 100 prompts (reference: 1000)."""
    from sonicdiffusionbayeslab_tpu.quality_frontier import main

    out = Path("outputs/test_frontier")
    argv = ["--sd15", SNAPSHOT, "--prompts", "8", "--batch", "4",
            "--out", str(out)]
    if CLIP_SNAPSHOT:
        argv += ["--clip", CLIP_SNAPSHOT]
    if os.environ.get("SDBL_SD3_SNAPSHOT"):
        argv += ["--sd3", os.environ["SDBL_SD3_SNAPSHOT"]]
    assert main(argv) == 0
    rows = [json.loads(l) for l in (out.with_suffix(".jsonl")).read_text().splitlines()]
    labels = {r["mode"] for r in rows}
    assert {"exact_bf16", "tome_0.5", "int8_conv_only", "deep_cache_3",
            "max_stack(turbo+dc3)"} <= labels
    exact = next(r for r in rows if r["mode"] == "exact_bf16")
    assert exact["sec_per_image"] > 0
    if CLIP_SNAPSHOT:
        assert all(r["clip_score"] is not None for r in rows)
