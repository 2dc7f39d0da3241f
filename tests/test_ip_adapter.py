"""IP-Adapter: decoupled cross-attention correctness (scale-0 no-op, image
steering), processor-order converter round trip, engine + pipeline e2e."""

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
from sonicdiffusionbayeslab_tpu.models import ip_adapter as IP
from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

EMBED_DIM = 32


@pytest.fixture(scope="module")
def engine():
    return StableDiffusionEngine(
        UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def params(engine):
    base = engine.init_params(seed=0, latent_hw=8)
    ip = engine.init_ip_params(seed=1, latent_hw=8, embed_dim=EMBED_DIM, num_tokens=4)
    merged = dict(base)
    merged["unet"] = IP.merge_ip_params(
        base["unet"], IP.extract_ip_params(ip["unet"], engine.unet_config)
    )
    merged["image_proj"] = ip["image_proj"]
    return merged


def test_ip_attn_paths_order(engine):
    """Processor-order enumeration: down -> mid -> up (deepest first), odd
    indices — the contract that makes diffusers checkpoints convert."""
    paths = IP.ip_attn_paths(engine.unet_config)
    # tiny config: level 0 cross (1 layer), level 1 none -> down: 1;
    # mid (deepest level depth 1): 1; up level 0: layers_per_block+1 = 2.
    assert paths == [
        "down_0_attn_0/block_0/attn2",
        "mid_attn/block_0/attn2",
        "up_0_attn_0/block_0/attn2",
        "up_0_attn_1/block_0/attn2",
    ]
    assert IP.ip_processor_indices(engine.unet_config) == [1, 3, 5, 7]

    # SD-1.5 geometry: 16 cross attentions at odd indices 1..31 (the real
    # ip-adapter_sd15.bin key set).
    idx15 = IP.ip_processor_indices(UNetConfig.sd15())
    assert len(idx15) == 16 and idx15[0] == 1 and idx15[-1] == 31


def test_ip_scale_zero_is_noop(engine, params):
    """With scale 0 the decoupled branch contributes nothing: output equals
    the base UNet bit-for-bit (the adapter-off invariant)."""
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.array([321.0, 321.0])
    ctx = jnp.asarray(np.random.default_rng(2).standard_normal((2, 77, 32)), jnp.float32)
    tokens = jnp.asarray(np.random.default_rng(3).standard_normal((2, 4, 32)), jnp.float32)
    base = engine.unet.apply({"params": params["unet"]}, x, t, ctx)
    off = engine.unet.apply({"params": params["unet"]}, x, t, ctx,
                            ip_context=tokens, ip_scale=0.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))
    on = engine.unet.apply({"params": params["unet"]}, x, t, ctx,
                           ip_context=tokens, ip_scale=1.0)
    assert float(jnp.abs(on - base).max()) > 1e-6


def test_ip_checkpoint_round_trip(tmp_path, engine, params):
    """export -> torch .bin -> load_ip_adapter reproduces the trees exactly
    (validates the processor-index mapping both ways)."""
    import torch

    ip_tree = IP.extract_ip_params(params["unet"], engine.unet_config)
    sd = IP.export_ip_adapter(params["unet"], params["image_proj"], engine.unet_config)
    as_torch = {
        "image_proj": {k: torch.tensor(v) for k, v in sd["image_proj"].items()},
        "ip_adapter": {k: torch.tensor(v) for k, v in sd["ip_adapter"].items()},
    }
    torch.save(as_torch, tmp_path / "ip-adapter_tiny.bin")
    loaded = IP.load_ip_adapter(tmp_path / "ip-adapter_tiny.bin", engine)
    assert loaded["num_tokens"] == 4 and loaded["embed_dim"] == EMBED_DIM

    from sonicdiffusionbayeslab_tpu.models.weights import flatten

    fa, fb = flatten(jax.tree.map(np.asarray, ip_tree)), flatten(loaded["unet_ip"])
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=1e-6, err_msg=k)
    pa = flatten(jax.tree.map(np.asarray, params["image_proj"]))
    pb = flatten(loaded["image_proj"])
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], atol=1e-6, err_msg=k)


def test_ip_engine_sample_e2e(engine, params):
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    ctx = engine.encode_prompts(params, tok(["a cat"]))
    neg = engine.encode_prompts(params, tok([""]))
    plan = DPMSolverScheduler(solver_order=2).build_plan(3)
    emb = jnp.asarray(np.random.default_rng(5).standard_normal((1, EMBED_DIM)), jnp.float32)
    kw = dict(guidance_scale=5.0, latent_hw=(8, 8))
    out = engine.sample(params, plan, ctx, neg, jax.random.PRNGKey(29),
                        ip_adapter={"image_embeds": emb, "scale": 1.0}, **kw)
    assert out.images.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out.images).all())
    # scale 0 == no adapter at all.
    off = engine.sample(params, plan, ctx, neg, jax.random.PRNGKey(29),
                        ip_adapter={"image_embeds": emb, "scale": 0.0}, **kw)
    base = engine.sample(params, plan, ctx, neg, jax.random.PRNGKey(29), **kw)
    np.testing.assert_allclose(np.asarray(off.images), np.asarray(base.images), atol=1e-5)
    # nonzero scale steers.
    assert np.abs(np.asarray(out.images) - np.asarray(base.images)).max() > 1e-6


def test_ip_sdxl_engine_e2e():
    """IP-Adapter on the SDXL family: init handles text_time conditioning,
    decoupled attention rides the added_cond path."""
    from sonicdiffusionbayeslab_tpu.models import SDXLEngine, SDXLTextConfigs, VAEConfig

    eng = SDXLEngine(
        UNetConfig.tiny_xl(), VAEConfig.tiny(), SDXLTextConfigs.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    base = eng.init_params(seed=0, latent_hw=8)
    ip = eng.init_ip_params(seed=1, latent_hw=8, embed_dim=EMBED_DIM, num_tokens=4)
    p = dict(base)
    p["unet"] = IP.merge_ip_params(
        base["unet"], IP.extract_ip_params(ip["unet"], eng.unet_config)
    )
    p["image_proj"] = ip["image_proj"]
    tok1 = HashTokenizer(vocab_size=eng.text_config.vocab_size)
    tok2 = HashTokenizer(vocab_size=eng.text2_config.vocab_size)
    ctx, pooled = eng.encode_prompts_xl(p, tok1(["a cat"]), tok2(["a cat"]))
    added = {"text_embeds": pooled,
             "time_ids": jnp.asarray([[64., 64., 0., 0., 64., 64.]], jnp.float32)}
    emb = jnp.asarray(np.random.default_rng(5).standard_normal((1, EMBED_DIM)), jnp.float32)
    plan = DPMSolverScheduler(solver_order=1).build_plan(2)
    out = eng.sample(p, plan, ctx, None, jax.random.PRNGKey(0),
                     guidance_scale=0.0, latent_hw=(8, 8), added_cond=added,
                     ip_adapter={"image_embeds": emb, "scale": 1.0})
    assert out.images.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out.images).all())


def test_ip_pipeline_e2e():
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry
    from sonicdiffusionbayeslab_tpu.schedulers import EulerScheduler

    load_all_plugins()
    pipe = models_registry["stable_diffusion_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32",
        ip_adapter="nonexistent.bin",  # offline: random adapter init
    )
    pipe.scheduler = EulerScheduler()
    emb = np.random.default_rng(0).standard_normal((2, 1024)).astype(np.float32)
    images, exec_time, _ = pipe(["a cat", "a dog"], num_inference_steps=3,
                                guidance_scale=5.0, ip_image_embeds=emb)
    assert images.shape == (2, 16, 16, 3)
    assert exec_time > 0 and np.isfinite(images).all()
    with pytest.raises(ValueError, match="ip_adapter"):
        no_ip = models_registry["stable_diffusion_model"](
            pretrained_model="x", tiny=True, image_size=64, dtype="float32"
        )
        no_ip.scheduler = EulerScheduler()
        no_ip(["a cat"], num_inference_steps=2, ip_image_embeds=emb[:1])
