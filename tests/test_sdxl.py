"""SDXL-family support (beyond-reference model family): per-level transformer
depth/heads, text_time micro-conditioning, dual text towers, converter map,
end-to-end sampling through the shared engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.models import (
    SDXLEngine,
    SDXLTextConfigs,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from sonicdiffusionbayeslab_tpu.models import weights as W
from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler, EulerScheduler


@pytest.fixture(scope="module")
def engine():
    return SDXLEngine(
        UNetConfig.tiny_xl(), VAEConfig.tiny(), SDXLTextConfigs.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def params(engine):
    return engine.init_params(seed=0, latent_hw=8)


def _added(B, pooled_dim=16, k=6):
    rng = np.random.default_rng(0)
    return {
        "text_embeds": jnp.asarray(rng.standard_normal((B, pooled_dim)), jnp.float32),
        "time_ids": jnp.tile(jnp.asarray([[64., 64., 0., 0., 64., 64.]], jnp.float32), (B, 1)),
    }


def test_sdxl_unet_forward_and_added_cond(engine, params):
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([501, 501])
    ctx = jnp.ones((2, 77, 32))
    out = engine.unet.apply({"params": params["unet"]}, x, t, ctx, _added(2))
    assert out.shape == (2, 8, 8, 4) and bool(jnp.isfinite(out).all())

    # Micro-conditioning is live: different time_ids change the output.
    other = dict(_added(2))
    other["time_ids"] = other["time_ids"] * 0.5
    out2 = engine.unet.apply({"params": params["unet"]}, x, t, ctx, other)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6

    # The SDXL config refuses to run without its conditioning.
    with pytest.raises(ValueError, match="added_cond"):
        engine.unet.apply({"params": params["unet"]}, x, t, ctx)


def test_sdxl_per_level_depth_and_heads(engine, params):
    """tiny_xl: level 0 has no attention, level 1 has depth-2 transformers."""
    u = params["unet"]
    assert "down_0_attn_0" not in u
    assert "block_1" in u["down_1_attn_0"]  # depth 2 at level 1
    assert "block_2" not in u["down_1_attn_0"]
    assert "add_embedding" in u


def test_sdxl_unet_name_map_round_trip(engine, params):
    """SDXL map: per-level depth, LINEAR transformer projections,
    add_embedding — invert -> convert is exact."""
    nm = W.unet_name_map(engine.unet_config)
    tree = jax.tree.map(np.asarray, params["unet"])
    sd = W.invert(tree, nm)
    assert "add_embedding.linear_1.weight" in sd
    # Linear projection: 2-D tensors (SD-1.5 would have 4-D conv1x1 here).
    assert sd["down_blocks.1.attentions.0.proj_in.weight"].ndim == 2
    back = W.convert(sd, nm, W.flatten(tree).keys())
    fa, fb = W.flatten(tree), W.flatten(back)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_sdxl_dual_encoder_shapes(engine, params):
    tok1 = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    tok2 = HashTokenizer(vocab_size=engine.text2_config.vocab_size)
    ctx, pooled = engine.encode_prompts_xl(params, tok1(["a cat", "a dog"]),
                                           tok2(["a cat", "a dog"]))
    assert ctx.shape == (2, 77, 32)  # 16 (ViT-L tiny) + 16 (bigG tiny)
    assert pooled.shape == (2, 16)
    assert bool(jnp.isfinite(ctx).all()) and bool(jnp.isfinite(pooled).all())


def test_sdxl_sample_end_to_end(engine, params):
    tok1 = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    tok2 = HashTokenizer(vocab_size=engine.text2_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=2).build_plan(3)
    ctx, pooled = engine.encode_prompts_xl(params, tok1(["a cat"]), tok2(["a cat"]))
    nctx, npooled = engine.encode_prompts_xl(params, tok1([""]), tok2([""]))
    added = {
        "text_embeds": pooled, "negative_text_embeds": npooled,
        "time_ids": jnp.asarray([[64., 64., 0., 0., 64., 64.]], jnp.float32),
    }
    out = engine.sample(
        params, plan, ctx, nctx, jax.random.PRNGKey(29),
        guidance_scale=5.0, latent_hw=(8, 8), added_cond=added,
    )
    assert out.images.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out.images).all())
    out2 = engine.sample(
        params, plan, ctx, nctx, jax.random.PRNGKey(29),
        guidance_scale=5.0, latent_hw=(8, 8), added_cond=added,
    )
    np.testing.assert_array_equal(np.asarray(out.images), np.asarray(out2.images))


def test_sdxl_pipeline_registry_e2e():
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    pipe = models_registry["stable_diffusion_xl_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32"
    )
    pipe.scheduler = EulerScheduler()
    images, exec_time, x0 = pipe(["a cat", "a dog"], num_inference_steps=3,
                                 guidance_scale=5.0)
    assert images.shape == (2, 16, 16, 3)
    assert exec_time > 0 and np.isfinite(images).all()
    assert 0.0 <= images.min() and images.max() <= 1.0


def test_sdxl_time_ids_follow_height_width():
    """height/width overrides must drive the text_time micro-conditioning,
    not the construction-time image_size (SDXL reacts to these)."""
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    pipe = models_registry["stable_diffusion_xl_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32"
    )
    pipe._pooled_queue = [jnp.zeros((1, 16))]
    kw = pipe._extra_sample_kwargs(1, (8, 16))  # 64x128 px
    ids = np.asarray(kw["added_cond"]["time_ids"][0])
    np.testing.assert_array_equal(ids, [64.0, 128.0, 0.0, 0.0, 64.0, 128.0])

def test_sdxl_prompt_weighting_e2e():
    """Dual-tower emphasis: per-tower weights on the feature slices."""
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    pipe = models_registry["stable_diffusion_xl_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32",
        prompt_weighting=True,
    )
    pipe.scheduler = EulerScheduler()
    key = jax.random.PRNGKey(29)
    plain, _, _ = pipe(["a cat"], num_inference_steps=2, guidance_scale=5.0, key=key)
    emph, _, _ = pipe(["a (cat:1.8)"], num_inference_steps=2, guidance_scale=5.0, key=key)
    assert np.isfinite(emph).all()
    assert np.abs(emph - plain).max() > 1e-6


def test_sdxl_checkpoint_loader_synthetic(tmp_path, engine, params):
    """Synthesize a diffusers-layout SDXL snapshot from the inverted trees
    and load it back through load_sdxl_checkpoint."""
    import torch

    nm_unet = W.unet_name_map(engine.unet_config)
    nm_vae = W.vae_name_map(len(engine.vae_config.block_out_channels),
                            engine.vae_config.layers_per_block)
    nm_t1 = W.clip_text_name_map(engine.text_config.num_layers)
    nm_t2 = W.clip_text_name_map(engine.text2_config.num_layers)

    def save(sub, sd, name="pytorch_model.bin"):
        d = tmp_path / sub
        d.mkdir()
        torch.save({k: torch.tensor(v) for k, v in sd.items()}, d / name)

    save("unet", W.invert(jax.tree.map(np.asarray, params["unet"]), nm_unet),
         "diffusion_pytorch_model.bin")
    save("vae", W.invert(jax.tree.map(np.asarray, params["vae"]), nm_vae),
         "diffusion_pytorch_model.bin")
    save("text_encoder", W.invert(jax.tree.map(np.asarray, params["text"]), nm_t1))
    sd2 = W.invert(jax.tree.map(np.asarray, params["text2"]), nm_t2)
    sd2["text_projection.weight"] = np.transpose(np.asarray(params["text2_proj"]["kernel"]))
    save("text_encoder_2", sd2)

    loaded = W.load_sdxl_checkpoint(tmp_path, engine)
    for part in ("unet", "vae", "text", "text2", "text2_proj"):
        fa = W.flatten(jax.tree.map(np.asarray, params[part]))
        fb = W.flatten(loaded[part])
        assert fa.keys() == fb.keys(), part
        for k in fa:
            np.testing.assert_allclose(fa[k], fb[k], atol=1e-6, err_msg=f"{part}/{k}")


def test_sdxl_sample_on_mesh(engine, params):
    """8-way DP SDXL sampling (added_cond sharded with the batch) equals
    single-device."""
    from sonicdiffusionbayeslab_tpu.parallel import make_mesh, shard_params

    tok1 = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    tok2 = HashTokenizer(vocab_size=engine.text2_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=1).build_plan(2)
    prompts = [f"prompt {i}" for i in range(8)]
    ctx, pooled = engine.encode_prompts_xl(params, tok1(prompts), tok2(prompts))
    nctx, npooled = engine.encode_prompts_xl(params, tok1([""] * 8), tok2([""] * 8))
    time_ids = jnp.tile(jnp.asarray([[64., 64., 0., 0., 64., 64.]], jnp.float32), (8, 1))
    added = {"text_embeds": pooled, "negative_text_embeds": npooled,
             "time_ids": time_ids}
    key = jax.random.PRNGKey(3)
    kw = dict(guidance_scale=5.0, latent_hw=(8, 8), added_cond=added)

    single = engine.sample(params, plan, ctx, nctx, key, **kw)
    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        p = shard_params(params, mesh)
        sharded = engine.sample(p, plan, ctx, nctx, key, mesh=mesh, **kw)
    np.testing.assert_allclose(
        np.asarray(sharded.images), np.asarray(single.images), rtol=2e-4, atol=2e-4
    )
