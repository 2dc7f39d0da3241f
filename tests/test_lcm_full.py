"""w-conditioned (full-LCM) UNet support: time_cond_proj_dim config, the
guidance embedding, converter coverage, engine e2e with the LCM plan."""

import dataclasses

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
from sonicdiffusionbayeslab_tpu.models.sampler import guidance_scale_embedding
from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
from sonicdiffusionbayeslab_tpu.schedulers import LCMScheduler


@pytest.fixture(scope="module")
def engine():
    cfg = dataclasses.replace(UNetConfig.tiny(), time_cond_proj_dim=8)
    return StableDiffusionEngine(
        cfg, VAEConfig.tiny(), CLIPTextConfig.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def params(engine):
    return engine.init_params(seed=0, latent_hw=8)


def test_guidance_embedding_shape_and_distinctness():
    e1 = guidance_scale_embedding(jnp.asarray([7.0]), 8)
    e2 = guidance_scale_embedding(jnp.asarray([1.0]), 8)
    assert e1.shape == (1, 8)
    assert float(jnp.abs(e1 - e2).max()) > 1e-3
    odd = guidance_scale_embedding(jnp.asarray([3.0]), 7)
    assert odd.shape == (1, 7)


def test_wcond_unet_requires_and_uses_timestep_cond(engine, params):
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([501.0, 501.0])
    ctx = jnp.ones((2, 77, 32))
    with pytest.raises(ValueError, match="timestep_cond"):
        engine.unet.apply({"params": params["unet"]}, x, t, ctx)
    assert "cond_proj" in params["unet"]["time_embedding"]
    w1 = guidance_scale_embedding(jnp.full((2,), 7.0), 8)
    w2 = guidance_scale_embedding(jnp.full((2,), 0.0), 8)
    o1 = engine.unet.apply({"params": params["unet"]}, x, t, ctx, timestep_cond=w1)
    o2 = engine.unet.apply({"params": params["unet"]}, x, t, ctx, timestep_cond=w2)
    assert bool(jnp.isfinite(o1).all())
    assert float(jnp.abs(o1 - o2).max()) > 1e-6  # w actually conditions


def test_wcond_converter_round_trip(engine, params):
    nm = W.unet_name_map(engine.unet_config)
    tree = jax.tree.map(np.asarray, params["unet"])
    sd = W.invert(tree, nm)
    assert "time_embedding.cond_proj.weight" in sd
    back = W.convert(sd, nm, W.flatten(tree).keys())
    fa, fb = W.flatten(tree), W.flatten(back)
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_wcond_engine_lcm_sampling(engine, params):
    """Full-LCM inference shape: guidance embedded (no CFG), LCM plan."""
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    ctx = engine.encode_prompts(params, tok(["a cat"]))
    plan = LCMScheduler(original_inference_steps=10).build_plan(4)
    out = engine.sample(
        params, plan, ctx, None, jax.random.PRNGKey(29),
        guidance_scale=8.0,  # embedded via timestep_cond, not CFG (neg=None)
        latent_hw=(8, 8),
    )
    assert out.images.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(out.images).all())
    # Different embedded w changes the output (same rng).
    out2 = engine.sample(
        params, plan, ctx, None, jax.random.PRNGKey(29),
        guidance_scale=2.0, latent_hw=(8, 8),
    )
    assert np.abs(np.asarray(out.images) - np.asarray(out2.images)).max() > 1e-6
