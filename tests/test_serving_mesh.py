"""Serving + config-level mesh combined (the sdbl-serve --mesh_data claim),
and SDXL x0 introspection through the shared engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry
from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler
from sonicdiffusionbayeslab_tpu.serving import GenerateRequest, InferenceServer


def test_serving_over_data_parallel_mesh():
    """The micro-batcher on a mesh_data=8 pipeline: requests coalesce into
    mesh-sharded batches and match the single-device pipeline's images."""
    load_all_plugins()
    kw = dict(pretrained_model="x", tiny=True, image_size=64, dtype="float32")
    meshy = models_registry["stable_diffusion_model"](**kw, mesh_data=8)
    meshy.scheduler = DPMSolverScheduler(solver_order=2)
    # float32 readback: this test compares against the raw pipeline's float
    # images (the uint8 default is exercised in test_serving.py).
    srv = InferenceServer(meshy, max_batch=8, max_wait_ms=150.0,
                          readback_dtype="float32")
    try:
        futs = [
            srv.submit(GenerateRequest(f"prompt {i}", num_inference_steps=3, seed=100 + i))
            for i in range(8)
        ]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        srv.shutdown()
    assert all(o["image"].shape == (16, 16, 3) for o in outs)
    assert any(o["batch_size"] == 8 for o in outs)

    single = models_registry["stable_diffusion_model"](**kw)
    single.scheduler = DPMSolverScheduler(solver_order=2)
    imgs, _, _ = single(
        [f"prompt {i}" for i in range(8)], num_inference_steps=3,
        guidance_scale=7.5, negative_prompt=[""] * 8,
        # Server seed mapping: explicit seed s -> RNG stream 2s+1 (disjoint
        # from server-assigned even streams; serving/batcher.py).
        sample_indices=np.arange(100, 108) * 2 + 1, key=jax.random.PRNGKey(0),
    )
    got = np.stack([o["image"] for o in outs])
    np.testing.assert_allclose(got, imgs, rtol=2e-4, atol=2e-4)


def test_sdxl_x0_capture():
    """Full-batch per-step x0 introspection works for the SDXL family too
    (the reference contract, src/models.py:287-302, via the shared scan)."""
    from sonicdiffusionbayeslab_tpu.models import (
        SDXLEngine,
        SDXLTextConfigs,
        UNetConfig,
        VAEConfig,
    )
    from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer

    eng = SDXLEngine(
        UNetConfig.tiny_xl(), VAEConfig.tiny(), SDXLTextConfigs.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = eng.init_params(seed=0, latent_hw=8)
    tok1 = HashTokenizer(vocab_size=eng.text_config.vocab_size)
    tok2 = HashTokenizer(vocab_size=eng.text2_config.vocab_size)
    ctx, pooled = eng.encode_prompts_xl(params, tok1(["a", "b"]), tok2(["a", "b"]))
    added = {"text_embeds": pooled,
             "time_ids": jnp.tile(jnp.asarray([[64., 64., 0., 0., 64., 64.]]), (2, 1))}
    plan = DPMSolverScheduler(solver_order=2).build_plan(3)
    out = eng.sample(params, plan, ctx, None, jax.random.PRNGKey(0),
                     guidance_scale=0.0, latent_hw=(8, 8), added_cond=added,
                     collect_x0=True)
    assert out.x0_images.shape == (3, 2, 16, 16, 3)  # steps x batch x img
    assert bool(jnp.isfinite(out.x0_images).all())


def test_sdxl_img2img_e2e():
    """SDXL through the inherited img2img path (strength tail + added_cond)."""
    load_all_plugins()
    pipe = models_registry["stable_diffusion_xl_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32"
    )
    pipe.scheduler = DPMSolverScheduler(solver_order=2)
    src = np.random.default_rng(0).random((2, 16, 16, 3)).astype(np.float32)
    images, t, _ = pipe(["a cat", "a dog"], num_inference_steps=4,
                        guidance_scale=5.0, init_image=src, strength=0.5)
    assert images.shape == (2, 16, 16, 3)
    assert np.isfinite(images).all() and t > 0


def test_controlnet_plus_img2img_compose():
    """ControlNet residuals and an img2img tail compose in one call."""
    load_all_plugins()
    pipe = models_registry["stable_diffusion_controlnet_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32"
    )
    pipe.scheduler = DPMSolverScheduler(solver_order=2)
    rng = np.random.default_rng(1)
    src = rng.random((1, 16, 16, 3)).astype(np.float32)
    cond = rng.random((1, 128, 128, 3)).astype(np.float32)
    images, t, _ = pipe(["a cat"], num_inference_steps=4, guidance_scale=5.0,
                        init_image=src, strength=0.5, control_image=cond)
    assert images.shape == (1, 16, 16, 3)
    assert np.isfinite(images).all()
