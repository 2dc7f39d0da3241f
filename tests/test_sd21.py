"""SD-2.x family support (beyond-reference model family): 64-wide heads per
level, OpenCLIP ViT-H text tower, linear transformer projections,
v-prediction plans, variant detection in the pipeline."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.models import (
    CLIPTextConfig,
    StableDiffusionEngine,
    UNetConfig,
    VAEConfig,
)
from sonicdiffusionbayeslab_tpu.models import weights as W
from sonicdiffusionbayeslab_tpu.models.pipelines import StableDiffusionModel
from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
from sonicdiffusionbayeslab_tpu.schedulers import DDIMScheduler, DPMSolverScheduler


@pytest.fixture(scope="module")
def engine():
    return StableDiffusionEngine(
        UNetConfig.tiny21(), VAEConfig.tiny(), CLIPTextConfig.tiny21(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def params(engine):
    return engine.init_params(seed=0, latent_hw=8)


def test_sd21_config_geometry():
    cfg = UNetConfig.sd21()
    # 64-wide heads at every level (attention_head_dim=[5,10,20,20]).
    for lvl, ch in enumerate(cfg.block_out_channels):
        if cfg.cross_attention[lvl]:
            assert ch // cfg.heads_at(lvl) == 64
    assert cfg.cross_attention_dim == 1024
    assert cfg.linear_projection
    assert cfg.addition_time_embed_dim is None  # no SDXL text_time cond
    t = CLIPTextConfig.sd21()
    assert (t.hidden_size, t.num_layers, t.hidden_act) == (1024, 23, "gelu")


def test_sd21_unet_forward(engine, params):
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([501, 501])
    ctx = jnp.ones((2, 77, 32))
    out = engine.unet.apply({"params": params["unet"]}, x, t, ctx)
    assert out.shape == (2, 8, 8, 4) and bool(jnp.isfinite(out).all())


def test_sd21_name_map_linear_projections(engine, params):
    """SD-2.x converter map uses LINEAR proj_in/out (diffusers
    use_linear_projection) without any SDXL add_embedding keys."""
    nm = W.unet_name_map(engine.unet_config)
    tree = jax.tree.map(np.asarray, params["unet"])
    sd = W.invert(tree, nm)
    assert sd["down_blocks.0.attentions.0.proj_in.weight"].ndim == 2
    assert not any(k.startswith("add_embedding") for k in sd)
    back = W.convert(sd, nm, W.flatten(tree).keys())
    fa, fb = W.flatten(tree), W.flatten(back)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_sd15_name_map_conv_projections():
    """Contrast case: the SD-1.5 map still expects 1x1-conv projections."""
    eng = StableDiffusionEngine(
        UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    p = eng.init_params(seed=0, latent_hw=8)
    sd = W.invert(jax.tree.map(np.asarray, p["unet"]), W.unet_name_map(eng.unet_config))
    assert sd["down_blocks.0.attentions.0.proj_in.weight"].ndim == 4


def test_sd21_vpred_sample_end_to_end(engine, params):
    """v_prediction plan through the shared engine; differs from epsilon."""
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    ctx = engine.encode_prompts(params, tok(["a cat"]))
    neg = engine.encode_prompts(params, tok([""]))
    kw = dict(guidance_scale=5.0, latent_hw=(8, 8))
    key = jax.random.PRNGKey(29)

    plan_v = DPMSolverScheduler(prediction_type="v_prediction", solver_order=2).build_plan(3)
    out_v = engine.sample(params, plan_v, ctx, neg, key, **kw)
    assert out_v.images.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out_v.images).all())

    plan_e = DPMSolverScheduler(prediction_type="epsilon", solver_order=2).build_plan(3)
    out_e = engine.sample(params, plan_e, ctx, neg, key, **kw)
    assert np.abs(np.asarray(out_v.images) - np.asarray(out_e.images)).max() > 1e-6


def test_sd21_pipeline_variant_explicit():
    pipe = StableDiffusionModel(
        pretrained_model="x", tiny=True, image_size=64, dtype="float32",
        variant="sd21",
    )
    assert pipe.variant == "sd21"
    assert pipe.engine.unet_config.linear_projection
    assert pipe.engine.text_config.hidden_act == "gelu"
    pipe.scheduler = DDIMScheduler(prediction_type="v_prediction")
    images, exec_time, _ = pipe(["a cat", "a dog"], num_inference_steps=3,
                                guidance_scale=5.0)
    assert images.shape == (2, 16, 16, 3)
    assert exec_time > 0 and np.isfinite(images).all()


def test_sd21_variant_autodetect_from_name():
    assert StableDiffusionModel._resolve_variant(
        "auto", "stabilityai/stable-diffusion-2-1") == "sd21"
    assert StableDiffusionModel._resolve_variant(
        "auto", "runwayml/stable-diffusion-v1-5") == "sd15"


def test_sd21_variant_autodetect_from_snapshot(tmp_path):
    d = tmp_path / "unet"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({"cross_attention_dim": 1024}))
    assert StableDiffusionModel._resolve_variant("auto", str(tmp_path)) == "sd21"
    (d / "config.json").write_text(json.dumps({"cross_attention_dim": 768}))
    assert StableDiffusionModel._resolve_variant("auto", str(tmp_path)) == "sd15"
    with pytest.raises(ValueError, match="variant"):
        StableDiffusionModel._resolve_variant("sd30", "x")


def test_prediction_type_flows_from_experiment_params(tmp_path):
    """experiment_params.prediction_type reaches the scheduler via
    BaseMethod.build_scheduler (the SD-2.1 config path)."""
    import yaml

    from sonicdiffusionbayeslab_tpu.cli import run

    cfg = {
        "experiment_name": "t",
        "experiment": {"method": "dpm_solver", "seed": 29},
        "model": {"model_name": "stable_diffusion_model", "pretrained_model": "x",
                  "tiny": True, "image_size": 64, "variant": "sd21"},
        "scheduler": {"scheduler_name": "dpm_solver_scheduler"},
        "dataset": {"prompts": "data/dataset/prompts_sample.json", "image_size": 64},
        "quality_metrics": {"clip_score": {"model_name_or_path": "none"}},
        "logger": {"wandb_enable": False, "log_images_step": 1, "save": False},
        "inference": {"batch_size": 2, "batch_count": 1},
        "experiment_params": {"prediction_type": "v_prediction",
                              "num_inference_steps": [3]},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    metrics = run(str(p))
    assert len(metrics["exp"]) == 1 and metrics["time"][0] > 0
