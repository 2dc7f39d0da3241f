"""SD3 rectified-flow family: flow-matching scheduler oracle tests, MMDiT
golden-vs-numpy forward, engine/pipeline e2e, converter round trip, mesh.

Golden methodology (same as test_golden_blocks.py for the UNet/VAE): the
numpy reference below is written independently from the architecture
definition (Esser et al. 2024 / diffusers SD3Transformer2DModel semantics),
NOT from the Flax code, so a transposed kernel, wrong AdaLN chunk order, or
swapped joint-attention token order fails the test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.models.mmdit import MMDiT, MMDiTConfig
from sonicdiffusionbayeslab_tpu.models.sampler import CachePlan, SDXLTextConfigs
from sonicdiffusionbayeslab_tpu.models.sd3 import SD3Engine
from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
from sonicdiffusionbayeslab_tpu.models.vae import VAEConfig
from sonicdiffusionbayeslab_tpu.schedulers import FlowMatchEulerScheduler
from sonicdiffusionbayeslab_tpu.schedulers.flow import flow_sigmas

# --------------------------------------------------------------- scheduler


def test_flow_sigmas_match_shift_formula():
    T = 1000
    sig = flow_sigmas(8, shift=3.0, num_train_timesteps=T)
    base = np.linspace(1.0, 1.0 / T, 8)
    expect = 3.0 * base / (1.0 + 2.0 * base)
    np.testing.assert_allclose(sig[:-1], expect, rtol=1e-12)
    assert sig[-1] == 0.0 and sig[0] == 1.0  # shift fixes sigma=1
    # shift=1 is the identity grid
    np.testing.assert_allclose(flow_sigmas(5, shift=1.0)[:-1], np.linspace(1, 1e-3, 5))


def test_flow_plan_matches_naive_euler_oracle():
    from sonicdiffusionbayeslab_tpu.schedulers.runtime import run_plan

    sch = FlowMatchEulerScheduler(shift=3.0)
    plan = sch.build_plan(8)
    assert plan.nfe == 8 and plan.init_scale == 1.0

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)

    def model(t, lat):  # toy velocity field
        return 0.3 * lat + 0.01 * t / 1000.0

    final, x0s = jax.jit(lambda a: run_plan(plan, a, model, collect_x0=True))(x)

    sig = flow_sigmas(8, shift=3.0)
    ref = np.asarray(x)
    x0_ref = []
    for i in range(8):
        v = 0.3 * ref + 0.01 * (sig[i] * 1000) / 1000.0
        x0_ref.append(ref - sig[i] * v)
        ref = ref + (sig[i + 1] - sig[i]) * v
    np.testing.assert_allclose(np.asarray(final), ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x0s), np.asarray(x0_ref), atol=1e-6)


def test_flow_tail_plan_and_noised_latents():
    sch = FlowMatchEulerScheduler(shift=3.0)
    full, tail = sch.build_plan(6), sch.tail_plan(6, 2)
    np.testing.assert_allclose(tail.timesteps, full.timesteps[2:])
    np.testing.assert_allclose(tail.w_eps, full.w_eps[2:])
    z = np.ones((1, 4, 4, 4), np.float32)
    n = np.full((1, 4, 4, 4), 2.0, np.float32)
    s = flow_sigmas(6, shift=3.0)[2]
    np.testing.assert_allclose(
        np.asarray(sch.noised_latents(z, n, 6, 2)), (1 - s) * z + s * n, rtol=1e-6
    )
    # start of schedule: pure noise
    np.testing.assert_allclose(np.asarray(sch.noised_latents(z, n, 6, 0)), n)
    a, s_ = sch.blend_schedule(6, 0)
    assert len(a) == 6 and a[-1] == 1.0 and s_[-1] == 0.0


# ------------------------------------------------------- golden numpy MMDiT


def _ln(x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps)


def _dense(x, p):
    k = np.asarray(p["kernel"], np.float64)
    out = x @ k
    if "bias" in p:
        out = out + np.asarray(p["bias"], np.float64)
    return out


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _gelu_tanh(x):
    return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))


def _mlp_embedder(v, p):
    return _dense(_silu(_dense(v, p["fc1"])), p["fc2"])


def _adaln(c, p, n):
    return np.split(_dense(_silu(c), p["linear"]), n, axis=-1)


def _joint_attention(qi, ki, vi, qc, kc, vc, heads):
    def split(x):
        B, N, C = x.shape
        return x.reshape(B, N, heads, C // heads).transpose(0, 2, 1, 3)

    q = np.concatenate([split(qi), split(qc)], axis=2)  # image tokens first
    k = np.concatenate([split(ki), split(kc)], axis=2)
    v = np.concatenate([split(vi), split(vc)], axis=2)
    s = q @ k.transpose(0, 1, 3, 2) / np.sqrt(q.shape[-1])
    s = np.exp(s - s.max(-1, keepdims=True))
    s = s / s.sum(-1, keepdims=True)
    o = s @ v  # [B, H, N, D]
    B, H, N, D = o.shape
    return o.transpose(0, 2, 1, 3).reshape(B, N, H * D)


def _numpy_mmdit(cfg, params, lat, t, ctx_in, pooled):
    p = {k: v for k, v in params.items()}
    B, h, w, C = lat.shape
    ps = cfg.patch_size
    hp, wp = h // ps, w // ps
    x = lat.reshape(B, hp, ps, wp, ps, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, hp * wp, ps * ps * C)
    x = _dense(x, p["patch_proj"])

    # positional table: diffusers get_2d_sincos_pos_embed + center crop,
    # written out independently here.
    m, base = cfg.pos_embed_max_size, cfg.sample_size // ps
    coords = np.arange(m, dtype=np.float64) * base / m
    gw, gh = np.meshgrid(coords, coords)  # gw varies along axis 1

    def emb1d(dim, pos):
        om = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2))
        o = pos.reshape(-1)[:, None] * om[None]
        return np.concatenate([np.sin(o), np.cos(o)], axis=1)

    D = cfg.hidden_size
    table = np.concatenate([emb1d(D // 2, gw), emb1d(D // 2, gh)], axis=1).reshape(m, m, D)
    top, left = (m - hp) // 2, (m - wp) // 2
    x = x + table[top:top + hp, left:left + wp].reshape(1, hp * wp, D)

    # timestep sinusoid: [cos, sin] halves (flip_sin_to_cos)
    half = cfg.time_embed_channels // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float64) / half)
    ang = np.asarray(t, np.float64)[:, None] * freqs[None]
    t_sin = np.concatenate([np.cos(ang), np.sin(ang)], axis=-1)
    c = _mlp_embedder(t_sin, p["timestep_embedder"]) + _mlp_embedder(pooled, p["text_embedder"])

    ctx = _dense(ctx_in, p["context_embedder"])

    for i in range(cfg.depth):
        bp = p[f"blocks_{i}"]
        last = i == cfg.depth - 1
        im = _adaln(c, bp["norm1"], 6)
        xn = _ln(x) * (1 + im[1][:, None]) + im[0][:, None]
        if last:
            cscale, cshift = _adaln(c, bp["norm1_context"], 2)
            cn = _ln(ctx) * (1 + cscale[:, None]) + cshift[:, None]
        else:
            cm = _adaln(c, bp["norm1_context"], 6)
            cn = _ln(ctx) * (1 + cm[1][:, None]) + cm[0][:, None]
        o = _joint_attention(
            _dense(xn, bp["to_q"]), _dense(xn, bp["to_k"]), _dense(xn, bp["to_v"]),
            _dense(cn, bp["add_q_proj"]), _dense(cn, bp["add_k_proj"]),
            _dense(cn, bp["add_v_proj"]), cfg.num_heads,
        )
        N = x.shape[1]
        x = x + im[2][:, None] * _dense(o[:, :N], bp["to_out"])
        xm = _ln(x) * (1 + im[4][:, None]) + im[3][:, None]
        ff = _dense(_gelu_tanh(_dense(xm, bp["ff"]["proj_in"])), bp["ff"]["proj_out"])
        x = x + im[5][:, None] * ff
        if not last:
            ctx = ctx + cm[2][:, None] * _dense(o[:, N:], bp["to_add_out"])
            ctxm = _ln(ctx) * (1 + cm[4][:, None]) + cm[3][:, None]
            ctx = ctx + cm[5][:, None] * _dense(
                _gelu_tanh(_dense(ctxm, bp["ff_context"]["proj_in"])),
                bp["ff_context"]["proj_out"])

    scale, shift = _adaln(c, p["norm_out"], 2)
    x = _ln(x) * (1 + scale[:, None]) + shift[:, None]
    x = _dense(x, p["proj_out"])
    x = x.reshape(B, hp, wp, ps, ps, cfg.out_channels)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, h, w, cfg.out_channels)


@pytest.fixture(scope="module")
def mmdit():
    cfg = MMDiTConfig.tiny()
    mod = MMDiT(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    rng = np.random.default_rng(3)
    lat = jnp.asarray(rng.standard_normal((2, 8, 8, cfg.in_channels)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, cfg.joint_attention_dim)), jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((2, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.asarray([100.0, 700.0])
    params = mod.init(jax.random.PRNGKey(0), lat, t, ctx, {"text_embeds": pooled})["params"]
    return cfg, mod, params, lat, t, ctx, pooled


def test_mmdit_matches_independent_numpy(mmdit):
    cfg, mod, params, lat, t, ctx, pooled = mmdit
    got = mod.apply({"params": params}, lat, t, ctx, {"text_embeds": pooled})
    ref = _numpy_mmdit(
        cfg, jax.tree_util.tree_map(np.asarray, params),
        np.asarray(lat, np.float64), np.asarray(t, np.float64),
        np.asarray(ctx, np.float64), np.asarray(pooled, np.float64),
    )
    assert got.shape == (2, 8, 8, cfg.out_channels)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_mmdit_loud_errors(mmdit):
    cfg, mod, params, lat, t, ctx, pooled = mmdit
    with pytest.raises(ValueError, match="text_embeds"):
        mod.apply({"params": params}, lat, t, ctx, None)
    with pytest.raises(ValueError, match="joint_attention_dim"):
        mod.apply({"params": params}, lat, t, ctx[..., :8], {"text_embeds": pooled})
    with pytest.raises(ValueError, match="out of range"):
        mod.apply({"params": params}, lat, t, ctx, {"text_embeds": pooled},
                  return_cache=True, cache_branch_id=cfg.depth)
    with pytest.raises(ValueError, match="exclusive"):
        mod.apply({"params": params}, lat, t, ctx, {"text_embeds": pooled},
                  cache=jnp.zeros((2, 16, cfg.hidden_size)), return_cache=True)


def test_mmdit_tome_runs_and_differs(mmdit):
    """DiT-ToMe (models/mmdit.py MMDiTBlock): merging image tokens around
    the joint attention must keep the output shape (unmerge restores N),
    stay finite, change the result vs exact, and be deterministic."""
    from sonicdiffusionbayeslab_tpu.ops.tome import TomeConfig

    cfg, mod, params, lat, t, ctx, pooled = mmdit
    added = {"text_embeds": pooled}
    base = mod.apply({"params": params}, lat, t, ctx, added)
    tome = TomeConfig(ratio=0.5)
    out = mod.apply({"params": params}, lat, t, ctx, added, tome=tome)
    assert out.shape == base.shape
    assert np.all(np.isfinite(np.asarray(out)))
    assert not np.allclose(np.asarray(out), np.asarray(base))
    out2 = mod.apply({"params": params}, lat, t, ctx, added, tome=tome)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_mmdit_tome_zero_ratio_is_exact(mmdit):
    """ratio -> r=0 builds identity merge/unmerge; must equal the plain
    forward bit-for-bit (same ops, no gather)."""
    from sonicdiffusionbayeslab_tpu.ops.tome import TomeConfig

    cfg, mod, params, lat, t, ctx, pooled = mmdit
    added = {"text_embeds": pooled}
    base = mod.apply({"params": params}, lat, t, ctx, added)
    out = mod.apply({"params": params}, lat, t, ctx, added,
                    tome=TomeConfig(ratio=1e-6))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_mmdit_tome_indivisible_grid_skipped(mmdit):
    """A patch grid not divisible by the ToMe cell (sy/sx) must silently
    run exact (the hook's partition is undefined), not crash."""
    from sonicdiffusionbayeslab_tpu.ops.tome import TomeConfig

    cfg, mod, params, lat, t, ctx, pooled = mmdit
    added = {"text_embeds": pooled}
    # tiny grid is 4x4 patches; sy=3 does not divide it
    out = mod.apply({"params": params}, lat, t, ctx, added,
                    tome=TomeConfig(ratio=0.5, sy=3, sx=3))
    base = mod.apply({"params": params}, lat, t, ctx, added)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_mmdit_tome_composes_with_trunk_delta_cache(mmdit):
    """ToMe + trunk-delta caching must compose: a cached call replaying a
    delta recorded under the same ToMe config reproduces the full ToMe
    forward (shallow blocks rebuild the same matching; rand=False keeps the
    partition static so record/replay see identical merges)."""
    from sonicdiffusionbayeslab_tpu.ops.tome import TomeConfig

    cfg, mod, params, lat, t, ctx, pooled = mmdit
    added = {"text_embeds": pooled}
    tome = TomeConfig(ratio=0.5, rand=False)
    b = 1
    out_full, delta = mod.apply({"params": params}, lat, t, ctx, added,
                                return_cache=True, cache_branch_id=b, tome=tome)
    out_cached = mod.apply({"params": params}, lat, t, ctx, added,
                           cache=delta, cache_branch_id=b, tome=tome)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_full),
                               atol=1e-5)


def test_mmdit_trunk_delta_cache_exact_replay(mmdit):
    """DeepCache for the DiT family: a cached call replaying the delta
    recorded at the SAME inputs must reproduce the full call exactly
    (shallow blocks recompute x_b identically, x_b + delta == trunk out),
    and the full call with return_cache must equal the plain forward."""
    cfg, mod, params, lat, t, ctx, pooled = mmdit
    added = {"text_embeds": pooled}
    base = mod.apply({"params": params}, lat, t, ctx, added)
    for b in range(cfg.depth):
        out_full, delta = mod.apply({"params": params}, lat, t, ctx, added,
                                    return_cache=True, cache_branch_id=b)
        assert delta.shape == (2,) + mod.cache_shape(8, 8, b)
        np.testing.assert_array_equal(np.asarray(out_full), np.asarray(base))
        out_cached = mod.apply({"params": params}, lat, t, ctx, added,
                               cache=delta, cache_branch_id=b)
        np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_full),
                                   atol=1e-5)


def test_mmdit_qk_norm_variant():
    cfg = MMDiTConfig(depth=1, num_heads=2, head_dim=8, joint_attention_dim=12,
                      pooled_projection_dim=12, pos_embed_max_size=8,
                      sample_size=8, time_embed_channels=16, qk_norm=True)
    mod = MMDiT(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    lat = jnp.ones((1, 4, 4, cfg.in_channels))
    ctx = jnp.ones((1, 5, 12))
    params = mod.init(jax.random.PRNGKey(0), lat, jnp.ones((1,)), ctx,
                      {"text_embeds": jnp.ones((1, 12))})["params"]
    # separate per-stream RMSNorm scales exist
    assert "norm_q" in params["blocks_0"] and "norm_added_q" in params["blocks_0"]
    out = mod.apply({"params": params}, lat, jnp.ones((1,)), ctx,
                    {"text_embeds": jnp.ones((1, 12))})
    assert bool(jnp.isfinite(out).all())


# ------------------------------------------------------------- engine e2e


@pytest.fixture(scope="module")
def engine():
    return SD3Engine(MMDiTConfig.tiny(), VAEConfig.tiny16(), SDXLTextConfigs.tiny(),
                     dtype=jnp.float32, param_dtype=jnp.float32)


@pytest.fixture(scope="module")
def params(engine):
    return engine.init_params(seed=0, latent_hw=8)


def _encode_both(engine, params, prompts):
    tok1 = HashTokenizer(vocab_size=engine.text_config.vocab_size,
                         max_length=engine.text_config.max_length)
    tok2 = HashTokenizer(vocab_size=engine.text2_config.vocab_size,
                         max_length=engine.text2_config.max_length)
    return engine.encode_prompts_sd3(params, tok1(prompts), tok2(prompts))


def test_sd3_engine_sample_e2e(engine, params):
    ctx, pooled = _encode_both(engine, params, ["a cat", "a dog"])
    nctx, npooled = _encode_both(engine, params, ["", ""])
    assert ctx.shape[-1] == engine.unet_config.joint_attention_dim  # zero-padded
    plan = FlowMatchEulerScheduler(shift=3.0).build_plan(4)
    added = {"text_embeds": pooled, "negative_text_embeds": npooled,
             "time_ids": jnp.zeros((2, 6))}
    out = engine.sample(params, plan, ctx, nctx, jax.random.PRNGKey(0),
                        guidance_scale=5.0, latent_hw=(8, 8), collect_x0=True,
                        added_cond=added)
    assert out.images.shape == (2, 16, 16, 3)
    assert out.x0_images.shape == (4, 2, 16, 16, 3)
    assert out.nfe == 4
    assert float(jnp.min(out.images)) >= 0.0 and float(jnp.max(out.images)) <= 1.0
    out2 = engine.sample(params, plan, ctx, nctx, jax.random.PRNGKey(0),
                         guidance_scale=5.0, latent_hw=(8, 8), collect_x0=True,
                         added_cond=added)
    np.testing.assert_array_equal(np.asarray(out.images), np.asarray(out2.images))


def test_sd3_microbatch_matches_plain(engine, params):
    ctx, pooled = _encode_both(engine, params, ["a", "b", "c", "d"])
    nctx, npooled = _encode_both(engine, params, [""] * 4)
    plan = FlowMatchEulerScheduler().build_plan(3)
    added = {"text_embeds": pooled, "negative_text_embeds": npooled,
             "time_ids": jnp.zeros((4, 6))}
    kw = dict(guidance_scale=4.0, latent_hw=(8, 8), added_cond=added)
    plain = engine.sample(params, plan, ctx, nctx, jax.random.PRNGKey(1), **kw)
    chunked = engine.sample(params, plan, ctx, nctx, jax.random.PRNGKey(1),
                            microbatch=2, **kw)
    np.testing.assert_allclose(np.asarray(plain.images), np.asarray(chunked.images),
                               atol=1e-5)


def test_sd3_deepcache_through_engine(engine, params):
    """CachePlan drives the MMDiT through the same sampler machinery as
    the UNet: an all-full plan is EXACT (bit-equal to no cache), a real
    interval runs finite-and-different (approximate accel), and the cache
    tensor chunks correctly under micro-batching."""
    ctx, pooled = _encode_both(engine, params, ["a cat", "a dog"])
    nctx, npooled = _encode_both(engine, params, ["", ""])
    plan = FlowMatchEulerScheduler().build_plan(4)
    added = {"text_embeds": pooled, "negative_text_embeds": npooled,
             "time_ids": jnp.zeros((2, 6))}
    kw = dict(guidance_scale=4.0, latent_hw=(8, 8), added_cond=added)
    key = jax.random.PRNGKey(2)

    base = engine.sample(params, plan, ctx, nctx, key, **kw)
    exact = engine.sample(params, plan, ctx, nctx, key,
                          cache_plan=CachePlan.every(4, 1, branch=1), **kw)
    np.testing.assert_allclose(np.asarray(base.images), np.asarray(exact.images),
                               atol=1e-5)

    fast = engine.sample(params, plan, ctx, nctx, key,
                         cache_plan=CachePlan.every(4, 2, branch=1), **kw)
    assert fast.images.shape == base.images.shape
    assert bool(jnp.isfinite(fast.images).all())
    assert not np.allclose(np.asarray(fast.images), np.asarray(base.images))

    fast_mb = engine.sample(params, plan, ctx, nctx, key, microbatch=2,
                            cache_plan=CachePlan.every(4, 2, branch=1), **kw)
    np.testing.assert_allclose(np.asarray(fast.images), np.asarray(fast_mb.images),
                               atol=1e-5)


def test_sd3_vae16_shift_factor_roundtrip(engine, params):
    """decode(encode(x)) stays in range; the shift/scale contract holds."""
    cfgv = engine.vae_config
    assert cfgv.latent_channels == 16 and not cfgv.use_quant_conv
    img = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
    z = engine.encode_image_fn(params["vae"], img, jax.random.PRNGKey(0))
    assert z.shape[-1] == 16
    # scaling/shift inverse consistency at the function level
    mean, _ = engine.vae.apply({"params": params["vae"]}, img, method=engine.vae.encode)
    z2 = (mean - cfgv.shift_factor) * cfgv.scaling_factor
    back = z2 / cfgv.scaling_factor + cfgv.shift_factor
    np.testing.assert_allclose(np.asarray(back), np.asarray(mean),
                               rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------- converter


def test_mmdit_name_map_round_trip(engine, params):
    from sonicdiffusionbayeslab_tpu.models.weights import (
        convert,
        flatten,
        invert,
        mmdit_name_map,
    )

    nm = mmdit_name_map(engine.unet_config)
    torch_sd = invert(params["unet"], nm)
    assert "pos_embed.proj.weight" in torch_sd
    assert torch_sd["pos_embed.proj.weight"].shape == (
        engine.unet_config.hidden_size, engine.unet_config.in_channels, 2, 2)
    back = convert(torch_sd, nm, flatten(params["unet"]).keys(), np.float32)
    for k, v in flatten(params["unet"]).items():
        np.testing.assert_allclose(flatten(back)[k], np.asarray(v), atol=1e-6,
                                   err_msg=k)


# ------------------------------------------------------------- pipeline


def test_sd3_pipeline_registry_e2e():
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    pipe = models_registry["stable_diffusion_3_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32")
    pipe.scheduler = FlowMatchEulerScheduler(shift=3.0)
    imgs, t, x0 = pipe(["a cat", "a dog"], num_inference_steps=3,
                       guidance_scale=5.0, use_x0=True)
    assert imgs.shape == (2, 16, 16, 3)
    assert t > 0 and x0.shape[0] == 3
    # img2img flows through tail_plan + flow-path noised seeding
    init = np.zeros((2, 16, 16, 3), np.float32)
    imgs2, _, _ = pipe(["a cat", "a dog"], num_inference_steps=4,
                       init_image=init, strength=0.5, guidance_scale=1.0)
    assert imgs2.shape == (2, 16, 16, 3)


def test_sd3_pipeline_rejects_unet_only_features():
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    with pytest.raises(NotImplementedError, match="prompt weighting"):
        models_registry["stable_diffusion_3_model"](
            pretrained_model="x", tiny=True, prompt_weighting=True)
    with pytest.raises(NotImplementedError, match="IP-Adapter"):
        models_registry["stable_diffusion_3_model"](
            pretrained_model="x", tiny=True, ip_adapter="foo.bin")


def test_t5_tp_matches_replicated():
    """2-way tensor-parallel T5 encode (head-split q/k/v, hidden-split gated
    FF — parallel/mesh.py T5 rules) == replicated, GSPMD collectives only.
    This is the multi-chip path for `use_t5: true` at T5-XXL scale (~9.4 GB
    bf16 won't replicate next to the 2B MMDiT on one chip)."""
    from sonicdiffusionbayeslab_tpu.models.t5 import T5Config, T5Encoder
    from sonicdiffusionbayeslab_tpu.parallel import make_mesh, shard_batch, shard_params

    cfg = T5Config.tiny()
    enc = T5Encoder(cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (4, cfg.max_length))
    ids = jnp.asarray(ids, jnp.int32)
    p = enc.init(jax.random.PRNGKey(0), ids)["params"]
    ref = enc.apply({"params": p}, ids)["last_hidden_state"]

    mesh = make_mesh(n_data=4, n_model=2)
    with mesh:
        ps = shard_params(p, mesh)
        # The TP rules must actually split the big kernels (not silently
        # replicate): check one of each family.
        specs = jax.tree_util.tree_map(lambda a: a.sharding.spec, ps)
        assert specs["block_0"]["attn"]["q"]["kernel"] == jax.sharding.PartitionSpec(None, "model")
        assert specs["block_0"]["wo"]["kernel"] == jax.sharding.PartitionSpec("model", None)
        ids_s = shard_batch(mesh, ids)
        out = jax.jit(lambda p, i: enc.apply({"params": p}, i)["last_hidden_state"])(ps, ids_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sd3_sample_on_mesh(engine, params):
    """8-way data-parallel sampling == single device (same seeds)."""
    from sonicdiffusionbayeslab_tpu.parallel import make_mesh, shard_params

    prompts = [f"prompt {i}" for i in range(8)]
    ctx, pooled = _encode_both(engine, params, prompts)
    plan = FlowMatchEulerScheduler().build_plan(2)
    added = {"text_embeds": pooled, "time_ids": jnp.zeros((8, 6))}
    single = engine.sample(params, plan, ctx, None, jax.random.PRNGKey(0),
                           guidance_scale=1.0, latent_hw=(8, 8), added_cond=added)
    mesh = make_mesh(n_data=8)
    sp = shard_params(params, mesh)
    meshed = engine.sample(sp, plan, ctx, None, jax.random.PRNGKey(0),
                           guidance_scale=1.0, latent_hw=(8, 8), added_cond=added,
                           mesh=mesh)
    np.testing.assert_allclose(np.asarray(single.images), np.asarray(meshed.images),
                               atol=2e-5)


# ------------------------------------------------------- triple-tower (T5)


def test_sd3_t5_width_guard():
    from sonicdiffusionbayeslab_tpu.models.t5 import T5Config

    with pytest.raises(ValueError, match="joint_attention_dim"):
        SD3Engine(MMDiTConfig.tiny(), VAEConfig.tiny16(), SDXLTextConfigs.tiny(),
                  t5_config=T5Config(d_model=64), dtype=jnp.float32)


def test_sd3_triple_tower_encode_and_sample(engine, params):
    """Full SD3 conditioning: [padded CLIP ctx ++ T5 states] on the sequence
    axis; the CLIP prefix must be bit-identical to the drop-T5 engine's
    context, and the MMDiT must accept the longer sequence end-to-end."""
    from sonicdiffusionbayeslab_tpu.models.t5 import T5Config

    eng = SD3Engine(MMDiTConfig.tiny(), VAEConfig.tiny16(), SDXLTextConfigs.tiny(),
                    t5_config=T5Config.tiny(), dtype=jnp.float32,
                    param_dtype=jnp.float32)
    assert eng.t5 is not None
    p3 = eng.init_params(seed=0, latent_hw=8)

    prompts = ["a cat", "a dog"]
    tok1 = HashTokenizer(eng.text_config.vocab_size, eng.text_config.max_length)
    tok2 = HashTokenizer(eng.text2_config.vocab_size, eng.text2_config.max_length)
    tok3 = HashTokenizer(eng.t5_config.vocab_size, eng.t5_config.max_length)
    ids1, ids2, ids3 = tok1(prompts), tok2(prompts), tok3(prompts)

    ctx, pooled = eng.encode_prompts_sd3(p3, ids1, ids2, ids3)
    T_clip = eng.text_config.max_length
    assert ctx.shape == (2, T_clip + eng.t5_config.max_length,
                         eng.unet_config.joint_attention_dim)

    # the CLIP prefix equals the drop-T5 encode (same params subtree)
    ctx0, pooled0 = eng.encode_prompts_sd3(p3, ids1, ids2)
    np.testing.assert_allclose(np.asarray(ctx[:, :T_clip]), np.asarray(ctx0),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(pooled0))

    # drop-T5 engine rejects ids3
    with pytest.raises(ValueError, match="use_t5"):
        engine.encode_prompts_sd3(params, ids1, ids2, ids3)

    # e2e sample with the longer joint sequence
    nctx, npooled = eng.encode_prompts_sd3(p3, tok1(["", ""]), tok2(["", ""]),
                                           tok3(["", ""]))
    plan = FlowMatchEulerScheduler(shift=3.0).build_plan(2)
    added = {"text_embeds": pooled, "negative_text_embeds": npooled,
             "time_ids": jnp.zeros((2, 6))}
    out = eng.sample(p3, plan, ctx, nctx, jax.random.PRNGKey(0),
                     guidance_scale=5.0, latent_hw=(8, 8), added_cond=added)
    assert out.images.shape == (2, 16, 16, 3)


def test_sd3_pipeline_use_t5_e2e():
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    pipe = models_registry["stable_diffusion_3_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32",
        use_t5=True)
    assert pipe.engine.t5 is not None and pipe.tokenizer3 is not None
    pipe.scheduler = FlowMatchEulerScheduler(shift=3.0)
    imgs, t, _ = pipe(["a cat"], num_inference_steps=2, guidance_scale=5.0)
    assert imgs.shape == (1, 16, 16, 3)


def test_sd3_t5_staged_matches_resident():
    """Staged T5 (host-resident params, transfer -> encode -> free before
    the denoise loop) is bit-identical to the all-resident path — same key
    derivation in engine.init_t5_params, same encode jit.  The real-
    geometry motivation is docs/MODELS.md: T5-XXL (~9.5 GB bf16) + MMDiT +
    dual CLIP exceed one v5e's 15.75 GB HBM resident, but encode-phase
    (T5 + CLIPs) and sample-phase (MMDiT + VAE) each fit alone."""
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()

    def mk(staged):
        return models_registry["stable_diffusion_3_model"](
            pretrained_model="x", tiny=True, image_size=64, dtype="float32",
            use_t5=True, t5_staged=staged, seed=7)

    resident, staged = mk(False), mk(True)
    assert "t5" in resident.params
    assert "t5" not in staged.params and staged._t5_host is not None
    for pipe in (resident, staged):
        pipe.scheduler = FlowMatchEulerScheduler(shift=3.0)
    img_r, _, _ = resident(["a cat"], num_inference_steps=2, guidance_scale=5.0)
    img_s, _, _ = staged(["a cat"], num_inference_steps=2, guidance_scale=5.0)
    np.testing.assert_array_equal(np.asarray(img_r), np.asarray(img_s))
    # The device copy was freed before sampling; the next call re-stages.
    assert staged._t5_dev is None
    img_s2, _, _ = staged(["a dog"], num_inference_steps=2, guidance_scale=5.0)
    assert staged._t5_dev is None and img_s2.shape == img_s.shape


def test_sd3_t5_staged_auto_resolution():
    """`t5_staged: auto` stages at real geometry on a single chip, stays
    resident in tiny mode and whenever a mesh is present (TP rules own the
    multi-chip layout, parallel/mesh.py)."""
    from sonicdiffusionbayeslab_tpu.registry import load_all_plugins, models_registry

    load_all_plugins()
    tiny_auto = models_registry["stable_diffusion_3_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32",
        use_t5=True)
    assert "t5" in tiny_auto.params and tiny_auto._t5_host is None
    meshed = models_registry["stable_diffusion_3_model"](
        pretrained_model="x", tiny=True, image_size=64, dtype="float32",
        use_t5=True, t5_staged=True, mesh_data=len(jax.devices()))
    assert "t5" in meshed.params and meshed._t5_host is None
