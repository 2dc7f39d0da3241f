"""ControlNet (beyond-reference model family): zero-init no-op property,
residual injection, converter round trip, pipeline e2e, ControlNet LoRA-free
training of the encoder copy is out of scope (adapters train via training/)."""

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
from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler


@pytest.fixture(scope="module")
def engine():
    return StableDiffusionEngine(
        UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def params(engine):
    return engine.init_params(seed=0, latent_hw=8)


@pytest.fixture(scope="module")
def cn_params(engine):
    return engine.init_controlnet_params(seed=0, latent_hw=8)


def _cond(B=2, hw=64):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((B, hw, hw, 3)), jnp.float32)


def test_controlnet_forward_shapes(engine, cn_params):
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([501.0, 501.0])
    ctx = jnp.ones((2, 77, 32))
    down, mid = engine.controlnet.apply(
        {"params": cn_params}, x, t, ctx, _cond(), 1.0
    )
    # tiny config: 1 conv_in skip + level0 (1 layer + downsample) + level1 (1
    # layer) = 4 skips.
    assert len(down) == 4
    assert down[0].shape == (2, 8, 8, 32)
    assert down[-1].shape == (2, 4, 4, 64)
    assert mid.shape == (2, 4, 4, 64)


def test_zero_init_controlnet_is_noop(engine, params, cn_params):
    """Fresh zero convs -> residuals are exactly zero -> UNet output equals
    the bare forward (the ControlNet training-start invariant)."""
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.array([321.0, 321.0])
    ctx = jnp.asarray(np.random.default_rng(2).standard_normal((2, 77, 32)), jnp.float32)
    down, mid = engine.controlnet.apply({"params": cn_params}, x, t, ctx, _cond(), 1.0)
    assert all(float(jnp.abs(r).max()) == 0.0 for r in down)
    assert float(jnp.abs(mid).max()) == 0.0

    base = engine.unet.apply({"params": params["unet"]}, x, t, ctx)
    with_ctrl = engine.unet.apply(
        {"params": params["unet"]}, x, t, ctx, control_residuals=(down, mid)
    )
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_ctrl))


def test_nonzero_residuals_change_output(engine, params, cn_params):
    """Give the zero convs weight: the injected residuals steer the UNet."""
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([321.0, 321.0])
    ctx = jnp.ones((2, 77, 32))
    p = jax.tree.map(lambda v: v, cn_params)
    p = jax.tree_util.tree_map_with_path(
        lambda path, v: jnp.full_like(v, 0.01)
        if any(getattr(k, "key", "").startswith("control_") for k in path)
        else v,
        p,
    )
    down, mid = engine.controlnet.apply({"params": p}, x, t, ctx, _cond(), 1.0)
    assert any(float(jnp.abs(r).max()) > 0 for r in down)
    base = engine.unet.apply({"params": params["unet"]}, x, t, ctx)
    out = engine.unet.apply(
        {"params": params["unet"]}, x, t, ctx, control_residuals=(down, mid)
    )
    assert float(jnp.abs(out - base).max()) > 1e-6

    # conditioning_scale=0 kills the steering even with nonzero convs.
    down0, mid0 = engine.controlnet.apply({"params": p}, x, t, ctx, _cond(), 0.0)
    assert all(float(jnp.abs(r).max()) == 0.0 for r in down0)
    assert float(jnp.abs(mid0).max()) == 0.0


def test_controlnet_name_map_round_trip(engine, cn_params):
    nm = W.controlnet_name_map(engine.unet_config)
    tree = jax.tree.map(np.asarray, cn_params)
    sd = W.invert(tree, nm)
    assert "controlnet_cond_embedding.conv_in.weight" in sd
    assert "controlnet_down_blocks.0.weight" in sd
    assert "controlnet_mid_block.weight" in sd
    assert not any(k.startswith("up_blocks") for k in sd)
    back = W.convert(sd, nm, W.flatten(tree).keys())
    fa, fb = W.flatten(tree), W.flatten(back)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_controlnet_checkpoint_loader_synthetic(tmp_path, engine, cn_params):
    import torch

    nm = W.controlnet_name_map(engine.unet_config)
    sd = W.invert(jax.tree.map(np.asarray, cn_params), nm)
    torch.save({k: torch.tensor(v) for k, v in sd.items()},
               tmp_path / "diffusion_pytorch_model.bin")
    loaded = W.load_controlnet_checkpoint(tmp_path, engine)
    fa, fb = W.flatten(jax.tree.map(np.asarray, cn_params)), W.flatten(loaded)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=1e-6, err_msg=k)


def test_controlnet_sample_end_to_end(engine, params, cn_params):
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    ctx = engine.encode_prompts(params, tok(["a cat"]))
    neg = engine.encode_prompts(params, tok([""]))
    plan = DPMSolverScheduler(solver_order=2).build_plan(3)
    out = engine.sample(
        params, plan, ctx, neg, jax.random.PRNGKey(29),
        guidance_scale=5.0, latent_hw=(8, 8),
        control={"params": cn_params, "image": _cond(1), "scale": 1.0},
    )
    assert out.images.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out.images).all())
    # Zero-init control == no control at all (engine-level invariant).
    base = engine.sample(
        params, plan, ctx, neg, jax.random.PRNGKey(29),
        guidance_scale=5.0, latent_hw=(8, 8),
    )
    np.testing.assert_allclose(
        np.asarray(out.images), np.asarray(base.images), atol=1e-5
    )


def test_controlnet_rejects_deepcache(engine, params, cn_params):
    from sonicdiffusionbayeslab_tpu.models.sampler import CachePlan

    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    ctx = engine.encode_prompts(params, tok(["a cat"]))
    plan = DPMSolverScheduler(solver_order=1).build_plan(2)
    with pytest.raises(ValueError, match="DeepCache"):
        engine.sample(
            params, plan, ctx, None, jax.random.PRNGKey(0),
            guidance_scale=0.0, latent_hw=(8, 8),
            cache_plan=CachePlan.every(2, 2),
            control={"params": cn_params, "image": _cond(1), "scale": 1.0},
        )


def test_sdxl_controlnet_zero_init_noop_and_conditioning():
    """SDXL-family ControlNet: encoder copy threads text_time conditioning;
    zero-init heads keep the SDXL UNet output bit-identical."""
    from sonicdiffusionbayeslab_tpu.models import SDXLEngine, SDXLTextConfigs

    eng = SDXLEngine(
        UNetConfig.tiny_xl(), VAEConfig.tiny(), SDXLTextConfigs.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = eng.init_params(seed=0, latent_hw=8)
    cn = eng.init_controlnet_params(seed=0, latent_hw=8)
    assert "add_embedding" in cn  # text_time conditioning present in the copy

    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([501.0, 501.0])
    ctx = jnp.ones((2, 77, 32))
    added = {
        "text_embeds": jnp.ones((2, 16), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[64., 64., 0., 0., 64., 64.]], jnp.float32), (2, 1)),
    }
    with pytest.raises(ValueError, match="added_cond"):
        eng.controlnet.apply({"params": cn}, x, t, ctx, _cond(), 1.0)
    down, mid = eng.controlnet.apply({"params": cn}, x, t, ctx, _cond(), 1.0, added)
    assert all(float(jnp.abs(r).max()) == 0.0 for r in down)
    base = eng.unet.apply({"params": params["unet"]}, x, t, ctx, added)
    out = eng.unet.apply({"params": params["unet"]}, x, t, ctx, added,
                         control_residuals=(down, mid))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))

    # Converter round trip for the SDXL-family map (incl. add_embedding).
    nm = W.controlnet_name_map(eng.unet_config)
    sd = W.invert(jax.tree.map(np.asarray, cn), nm)
    assert "add_embedding.linear_1.weight" in sd
    back = W.convert(sd, nm, W.flatten(jax.tree.map(np.asarray, cn)).keys())
    fa, fb = W.flatten(jax.tree.map(np.asarray, cn)), W.flatten(back)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_sdxl_controlnet_sample_end_to_end():
    from sonicdiffusionbayeslab_tpu.models import SDXLEngine, SDXLTextConfigs
    from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer

    eng = SDXLEngine(
        UNetConfig.tiny_xl(), VAEConfig.tiny(), SDXLTextConfigs.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = eng.init_params(seed=0, latent_hw=8)
    cn = eng.init_controlnet_params(seed=0, latent_hw=8)
    tok1 = HashTokenizer(vocab_size=eng.text_config.vocab_size)
    tok2 = HashTokenizer(vocab_size=eng.text2_config.vocab_size)
    ctx, pooled = eng.encode_prompts_xl(params, tok1(["a cat"]), tok2(["a cat"]))
    nctx, npooled = eng.encode_prompts_xl(params, tok1([""]), tok2([""]))
    added = {"text_embeds": pooled, "negative_text_embeds": npooled,
             "time_ids": jnp.asarray([[64., 64., 0., 0., 64., 64.]], jnp.float32)}
    plan = DPMSolverScheduler(solver_order=2).build_plan(3)
    out = eng.sample(
        params, plan, ctx, nctx, jax.random.PRNGKey(29),
        guidance_scale=5.0, latent_hw=(8, 8), added_cond=added,
        control={"params": cn, "image": _cond(1), "scale": 1.0},
    )
    assert out.images.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out.images).all())


def test_controlnet_pipeline_registry_e2e():
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry
    from sonicdiffusionbayeslab_tpu.schedulers import EulerScheduler

    load_all_plugins()
    pipe = models_registry["stable_diffusion_controlnet_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32"
    )
    pipe.scheduler = EulerScheduler()
    cond = np.random.default_rng(0).random((2, 128, 128, 3)).astype(np.float32)
    images, exec_time, _ = pipe(
        ["a cat", "a dog"], num_inference_steps=3, guidance_scale=5.0,
        control_image=cond,  # wrong resolution on purpose: pipeline resizes
    )
    assert images.shape == (2, 16, 16, 3)
    assert exec_time > 0 and np.isfinite(images).all()
    with pytest.raises(ValueError, match="control_image"):
        pipe(["a cat"], num_inference_steps=2)
