"""Tiny-model integration tests (SURVEY §4): random-weight 2-level UNet,
CPU backend — shapes, determinism, cache-path consistency, E2E sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.models import (
    CachePlan,
    CLIPTextConfig,
    CLIPTextModel,
    StableDiffusionEngine,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer, load_tokenizer
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


def test_unet_forward_shapes(engine, params):
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.array([901, 901])
    ctx = jnp.ones((2, 77, 32))
    out = engine.unet.apply({"params": params["unet"]}, x, t, ctx)
    assert out.shape == (2, 8, 8, 4)
    assert out.dtype == jnp.float32


def test_unet_cached_matches_full(engine, params):
    """Shallow-branch-with-injected-cache must reproduce the full pass when
    given the full pass's own deep features (static-structure DeepCache)."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.array([501, 501])
    ctx = jnp.asarray(np.random.default_rng(1).standard_normal((2, 77, 32)), jnp.float32)
    full, deep = engine.unet.apply({"params": params["unet"]}, x, t, ctx, return_cache=True)
    assert deep.shape == (2,) + engine.unet.cache_shape(8, 8)
    cached = engine.unet.apply({"params": params["unet"]}, x, t, ctx, cache=deep)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full), rtol=1e-5, atol=1e-5)


def test_vae_roundtrip_shapes(engine, params):
    z = jnp.ones((2, 8, 8, 4))
    img = engine.vae.apply({"params": params["vae"]}, z, method=engine.vae.decode)
    assert img.shape == (2, 16, 16, 3)  # tiny VAE: 2 levels -> 2x upsample
    mean, logvar = engine.vae.apply({"params": params["vae"]}, img, method=engine.vae.encode)
    assert mean.shape == (2, 8, 8, 4) and logvar.shape == (2, 8, 8, 4)


def test_clip_text_causal(engine, params):
    ids = np.full((1, 77), 7, np.int32)
    ids2 = ids.copy()
    ids2[0, 50] = 9  # change a late token
    h1 = engine.text.apply({"params": params["text"]}, jnp.asarray(ids))["last_hidden_state"]
    h2 = engine.text.apply({"params": params["text"]}, jnp.asarray(ids2))["last_hidden_state"]
    np.testing.assert_allclose(h1[0, :50], h2[0, :50], atol=1e-6)  # earlier unaffected
    assert np.abs(np.asarray(h1[0, 50:]) - np.asarray(h2[0, 50:])).max() > 1e-4


def test_hash_tokenizer_contract():
    tok = HashTokenizer(vocab_size=1000, max_length=77)
    ids = tok(["a man on a snowboard", "a man on a snowboard"])
    assert ids.shape == (2, 77) and (ids[0] == ids[1]).all()
    assert ids[0, 0] == 998 and ids[0, -1] == 999  # BOS / EOS-pad
    assert (tok(["hello"])[0] != tok(["world"])[0]).any()


def test_bpe_tokenizer_with_synthetic_vocab(tmp_path):
    import json

    # Minimal byte-level vocab: all byte symbols + a merge of "ab" -> "ab</w>".
    from sonicdiffusionbayeslab_tpu.models.tokenizer import _bytes_to_unicode

    symbols = list(_bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(symbols)}
    vocab.update({s + "</w>": len(vocab) + i for i, s in enumerate(symbols)})
    vocab["ab</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\na b</w>\n")
    tok = load_tokenizer(str(tmp_path))
    ids = tok(["ab a"])
    assert ids[0, 0] == vocab["<|startoftext|>"]
    assert ids[0, 1] == vocab["ab</w>"]  # merge applied
    assert ids[0, 2] == vocab["a</w>"]
    assert ids[0, 3] == vocab["<|endoftext|>"]


def test_load_tokenizer_falls_back():
    tok = load_tokenizer(None)
    assert isinstance(tok, HashTokenizer)


def test_sample_end_to_end(engine, params):
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=2).build_plan(4)
    embeds = engine.encode_prompts(params, tok(["a cat", "a dog"]))
    neg = engine.encode_prompts(params, tok(["", ""]))
    key = jax.random.PRNGKey(29)
    out = engine.sample(
        params, plan, embeds, neg, key,
        guidance_scale=7.5, latent_hw=(8, 8), collect_x0=True,
    )
    assert out.images.shape == (2, 16, 16, 3)
    # Per-step x0 for the FULL batch (reference decodes the captured batch,
    # src/models.py:287-302).
    assert out.x0_images.shape == (4, 2, 16, 16, 3)
    # x0 at the final step equals the model's x0 prediction trajectory's end —
    # and the narrowing knob keeps only the first n samples.
    narrowed = engine.sample(
        params, plan, embeds, neg, key,
        guidance_scale=7.5, latent_hw=(8, 8), collect_x0=True, x0_samples=1,
    )
    assert narrowed.x0_images.shape == (4, 1, 16, 16, 3)
    np.testing.assert_allclose(
        np.asarray(narrowed.x0_images[:, 0]), np.asarray(out.x0_images[:, 0]),
        atol=1e-5,
    )
    assert out.nfe == 4
    assert float(jnp.min(out.images)) >= 0.0 and float(jnp.max(out.images)) <= 1.0
    assert out.execution_time > 0

    # Determinism: same key -> identical images.
    out2 = engine.sample(
        params, plan, embeds, neg, key,
        guidance_scale=7.5, latent_hw=(8, 8), collect_x0=True,
    )
    np.testing.assert_array_equal(np.asarray(out.images), np.asarray(out2.images))


def test_sample_time_loop_false_async_path(engine, params):
    """time_loop=False (serving path) skips the loop-timing hard sync:
    execution_time comes back as the -1.0 sentinel and the images are
    bit-identical to the timed path."""
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=2).build_plan(3)
    embeds = engine.encode_prompts(params, tok(["a cat", "a dog"]))
    neg = engine.encode_prompts(params, tok(["", ""]))
    key = jax.random.PRNGKey(7)
    timed = engine.sample(params, plan, embeds, neg, key,
                          guidance_scale=7.5, latent_hw=(8, 8))
    untimed = engine.sample(params, plan, embeds, neg, key,
                            guidance_scale=7.5, latent_hw=(8, 8),
                            time_loop=False)
    assert timed.execution_time > 0
    assert untimed.execution_time == -1.0
    np.testing.assert_array_equal(np.asarray(timed.images),
                                  np.asarray(untimed.images))


def test_sample_batch_invariant_latents(engine, params):
    """Sample i's result depends only on its global index, not batch layout."""
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=1).build_plan(2)
    key = jax.random.PRNGKey(29)
    e3 = engine.encode_prompts(params, tok(["a", "b", "c"]))
    n3 = engine.encode_prompts(params, tok(["", "", ""]))
    big = engine.sample(params, plan, e3, n3, key, sample_indices=np.array([0, 1, 2]),
                        latent_hw=(8, 8))
    small = engine.sample(params, plan, e3[2:], n3[2:], key, sample_indices=np.array([2]),
                          latent_hw=(8, 8))
    np.testing.assert_allclose(
        np.asarray(big.images[2]), np.asarray(small.images[0]), atol=1e-5
    )


def test_unet_microbatch_matches_plain(engine, params, monkeypatch):
    """SDBL_UNET_MICROBATCH chunks the CFG-doubled UNet batch via lax.map
    (the batch-32 memory fix, docs/PERF.md) — outputs must be identical to
    the plain path, including composed with DeepCache (the cache tensor is
    batch-leading and chunks like the latents)."""
    from sonicdiffusionbayeslab_tpu.models.sampler import CachePlan

    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=2).build_plan(3)
    embeds = engine.encode_prompts(params, tok(["a cat", "a dog", "x", "y"]))
    neg = engine.encode_prompts(params, tok([""] * 4))
    key = jax.random.PRNGKey(29)
    kw = dict(guidance_scale=7.5, latent_hw=(8, 8))
    plain = engine.sample(params, plan, embeds, neg, key, **kw)
    cache_plain = engine.sample(params, plan, embeds, neg, key,
                                cache_plan=CachePlan.every(3, 2), **kw)
    monkeypatch.setenv("SDBL_UNET_MICROBATCH", "2")
    chunked = engine.sample(params, plan, embeds, neg, key, **kw)
    np.testing.assert_allclose(
        np.asarray(chunked.images), np.asarray(plain.images), atol=2e-5
    )
    cache_chunked = engine.sample(params, plan, embeds, neg, key,
                                  cache_plan=CachePlan.every(3, 2), **kw)
    np.testing.assert_allclose(
        np.asarray(cache_chunked.images), np.asarray(cache_plain.images), atol=2e-5
    )
    # ControlNet/IP-Adapter composition is still refused loudly.
    with pytest.raises(ValueError, match="MICROBATCH"):
        engine.sample(params, plan, embeds, neg, key,
                      ip_adapter={"image_embeds": jnp.zeros((4, 8)), "scale": 1.0},
                      **kw)
    # non-divisible chunking is an error, not silent truncation
    monkeypatch.setenv("SDBL_UNET_MICROBATCH", "3")
    with pytest.raises(ValueError, match="divide"):
        engine.sample(params, plan, embeds, neg, key, **kw)


def test_cfg_shared_prefix_matches_plain(engine, params, monkeypatch):
    """SDBL_CFG_PREFIX computes the CFG halves' shared prefix (conv_in,
    leading resnets, first self-attention) ONCE and tiles at the first
    cross-attention — identical math to plain CFG (docs/PERF.md)."""
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=2).build_plan(3)
    embeds = engine.encode_prompts(params, tok(["a cat", "a dog"]))
    neg = engine.encode_prompts(params, tok(["", ""]))
    key = jax.random.PRNGKey(29)
    kw = dict(guidance_scale=7.5, latent_hw=(8, 8))
    plain = engine.sample(params, plan, embeds, neg, key, **kw)
    monkeypatch.setenv("SDBL_CFG_PREFIX", "1")
    pfx = engine.sample(params, plan, embeds, neg, key, **kw)
    np.testing.assert_allclose(
        np.asarray(pfx.images), np.asarray(plain.images), atol=2e-5
    )
    # guidance off -> no CFG halves -> the knob silently no-ops
    solo = engine.sample(params, plan, embeds, None, key,
                         guidance_scale=1.0, latent_hw=(8, 8))
    assert solo.images.shape == plain.images.shape


def test_sample_with_deepcache(engine, params):
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=2).build_plan(6)
    embeds = engine.encode_prompts(params, tok(["a cat"]))
    neg = engine.encode_prompts(params, tok([""]))
    key = jax.random.PRNGKey(1)
    kw = dict(latent_hw=(8, 8))
    full = engine.sample(params, plan, embeds, neg, key, **kw)
    cached = engine.sample(
        params, plan, embeds, neg, key, cache_plan=CachePlan.every(6, 2), **kw
    )
    assert np.isfinite(np.asarray(cached.images)).all()
    # Cache interval 1 == full computation exactly.
    interval1 = engine.sample(
        params, plan, embeds, neg, key, cache_plan=CachePlan.every(6, 1), **kw
    )
    np.testing.assert_allclose(
        np.asarray(interval1.images), np.asarray(full.images), atol=1e-5
    )
    # And a genuinely cached run differs from full (it's an approximation).
    assert np.abs(np.asarray(cached.images) - np.asarray(full.images)).max() > 1e-6


def test_cache_plan_validation(engine, params):
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    plan = DPMSolverScheduler().build_plan(4)
    embeds = engine.encode_prompts(params, tok(["x"]))
    with pytest.raises(ValueError, match="length"):
        engine.sample(params, plan, embeds, None, jax.random.PRNGKey(0),
                      cache_plan=CachePlan.every(5, 2), latent_hw=(8, 8))
    bad = CachePlan(full=np.array([False, True, True, True]))
    with pytest.raises(ValueError, match="first step"):
        engine.sample(params, plan, embeds, None, jax.random.PRNGKey(0),
                      cache_plan=bad, latent_hw=(8, 8))


def test_unet_cache_branch1_matches_full(engine, params):
    """Generalized split: branch-1 cached pass reproduces the full pass when
    fed the full pass's own trunk features; deep-mode output is invariant to
    the (static) branch id."""
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.array([301, 301])
    ctx = jnp.asarray(np.random.default_rng(3).standard_normal((2, 77, 32)), jnp.float32)
    plain = engine.unet.apply({"params": params["unet"]}, x, t, ctx)
    full, deep = engine.unet.apply(
        {"params": params["unet"]}, x, t, ctx, return_cache=True, cache_branch_id=1
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(plain), rtol=1e-5, atol=1e-5)
    assert deep.shape == (2,) + engine.unet.cache_shape(8, 8, 1)
    assert deep.shape[1:3] == (4, 4)  # half resolution at branch 1
    cached = engine.unet.apply(
        {"params": params["unet"]}, x, t, ctx, cache=deep, cache_branch_id=1
    )
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full), rtol=1e-5, atol=1e-5)


def test_unet_cache_branch_out_of_range(engine, params):
    x = jnp.ones((1, 8, 8, 4))
    with pytest.raises(ValueError, match="out of range"):
        engine.unet.apply({"params": params["unet"]}, x, jnp.array([1]),
                          jnp.ones((1, 77, 32)), cache_branch_id=2)


def test_sample_with_deepcache_branch1(engine, params):
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    plan = DPMSolverScheduler(solver_order=2).build_plan(6)
    embeds = engine.encode_prompts(params, tok(["a dog"]))
    neg = engine.encode_prompts(params, tok([""]))
    key = jax.random.PRNGKey(2)
    kw = dict(latent_hw=(8, 8))
    full = engine.sample(params, plan, embeds, neg, key, **kw)
    cached = engine.sample(
        params, plan, embeds, neg, key, cache_plan=CachePlan.every(6, 2, branch=1), **kw
    )
    assert np.isfinite(np.asarray(cached.images)).all()
    assert np.abs(np.asarray(cached.images) - np.asarray(full.images)).max() > 1e-6


def test_compile_count_audit(engine, params):
    """Sweep compile discipline (VERDICT r1 item 9): plans sharing the static
    signature (num_steps, hist_depth, cfg-ness, noise-ness, ...) reuse ONE
    compiled denoise program (models/sampler.py:136-150); only signature
    changes (step count, solver order) add programs. Guards against changes
    that silently explode sweep compile time."""
    type(engine)._denoise_fn.cache_clear()
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    embeds = engine.encode_prompts(params, tok(["a", "b"]))
    neg = engine.encode_prompts(params, tok(["", ""]))
    key = jax.random.PRNGKey(0)

    def run(plan):
        engine.sample(params, plan, embeds, neg, key, latent_hw=(8, 8))

    # Three same-signature plans (4 steps, order 2): different coefficient
    # CONTENT, identical compiled program -> 1 miss, 2 hits.
    run(DPMSolverScheduler(solver_order=2).build_plan(4))
    run(DPMSolverScheduler(solver_order=2, use_karras_sigmas=True).build_plan(4))
    run(DPMSolverScheduler(solver_order=2, solver_type="heun").build_plan(4))
    info = type(engine)._denoise_fn.cache_info()
    assert (info.misses, info.hits) == (1, 2), info

    # A new step count is a new scan length -> exactly one more program.
    run(DPMSolverScheduler(solver_order=2).build_plan(6))
    assert type(engine)._denoise_fn.cache_info().misses == 2

    # A new history depth (order 3) -> one more.
    run(DPMSolverScheduler(solver_order=3).build_plan(6))
    assert type(engine)._denoise_fn.cache_info().misses == 3

    # Re-running the whole grid adds nothing.
    run(DPMSolverScheduler(solver_order=2).build_plan(4))
    run(DPMSolverScheduler(solver_order=2).build_plan(6))
    assert type(engine)._denoise_fn.cache_info().misses == 3


def test_pipeline_nonsquare_generation():
    """height/width call kwargs generate non-square images through the same
    engine (the engine's latent_hw was always a tuple; this exposes it)."""
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry
    from sonicdiffusionbayeslab_tpu.schedulers import EulerScheduler

    load_all_plugins()
    pipe = models_registry["stable_diffusion_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32"
    )
    pipe.scheduler = EulerScheduler()
    images, t, _ = pipe(["a cat"], num_inference_steps=2, guidance_scale=5.0,
                        height=64, width=128)
    # tiny VAE upsamples 2x from latents (64//8=8, 128//8=16 -> 16x32 px).
    assert images.shape == (1, 16, 32, 3)
    assert np.isfinite(images).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiples of 8"):
        pipe(["a cat"], num_inference_steps=2, height=65)
