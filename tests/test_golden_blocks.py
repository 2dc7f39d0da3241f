"""Golden forward tests for the UNet/VAE building blocks (VERDICT r2 #3).

CLIP and BLIP towers have real parity gates against HF transformers
(test_hf_forward_parity.py); diffusers is not installed, so the UNet/VAE —
the modules carrying ~95% of the FLOPs (reference src/models.py:227-235,
288-292) — are validated here against an INDEPENDENT naive NumPy
reimplementation of the architecture math (tests/golden_numpy.py).  These
tests fail on a transposed conv kernel, wrong GroupNorm grouping/variance,
head-slicing bugs, tanh-vs-erf gelu, or wrong downsample padding — the
silent corruptions converter round-trips and shape checks cannot see.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import golden_numpy as gn
from sonicdiffusionbayeslab_tpu.models.layers import (
    AttnBlock2D,
    Downsample,
    GEGLUFeedForward,
    GroupNorm,
    ResnetBlock,
    SpatialTransformer,
    TimestepEmbedMLP,
    Upsample,
    timestep_embedding,
)
from sonicdiffusionbayeslab_tpu.models.vae import AutoencoderKL, VAEConfig

RTOL, ATOL = 2e-5, 2e-5


def _np(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), tree)


def test_timestep_embedding_golden():
    t = np.array([0.0, 1.0, 47.0, 999.0], np.float32)
    got = np.asarray(timestep_embedding(jnp.asarray(t), 320))
    want = gn.timestep_embedding(t, 320)
    # atol 1e-4: fp32 sin/cos argument reduction at t=999 vs the float64 oracle
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # odd dim: zero-padded tail
    got3 = np.asarray(timestep_embedding(jnp.asarray(t), 7))
    np.testing.assert_allclose(got3, gn.timestep_embedding(t, 7), rtol=1e-5, atol=1e-5)


def test_group_norm_golden():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 6, 64), np.float32)
    mod = GroupNorm(num_groups=32, silu=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    p = _np(params)
    # non-trivial affine
    p["scale"] = rng.standard_normal(64).astype(np.float32)
    p["bias"] = rng.standard_normal(64).astype(np.float32)
    got = np.asarray(mod.apply({"params": p}, jnp.asarray(x)))
    want = gn.group_norm(x, p["scale"], p["bias"], groups=32, apply_silu=True)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_group_norm_grouping_is_contiguous():
    """Channel c belongs to group c // (C/G): a channel-interleaved grouping
    would pass the previous test only by luck; pin it explicitly."""
    x = np.zeros((1, 1, 1, 4), np.float32)
    x[0, 0, 0] = [1.0, 3.0, 100.0, 300.0]  # groups {1,3} and {100,300}
    mod = GroupNorm(num_groups=2, epsilon=0.0)
    p = {"scale": jnp.ones(4), "bias": jnp.zeros(4)}
    got = np.asarray(mod.apply({"params": p}, jnp.asarray(x)))[0, 0, 0]
    # contiguous groups normalize to exactly [-1, 1, -1, 1]
    np.testing.assert_allclose(got, [-1, 1, -1, 1], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("channel_change", [False, True])
def test_resnet_block_golden(channel_change):
    rng = np.random.default_rng(1)
    cin, cout = (32, 64) if channel_change else (64, 64)
    x = rng.standard_normal((2, 8, 8, cin), np.float32)
    t = rng.standard_normal((2, 128), np.float32)
    mod = ResnetBlock(out_channels=cout)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(t))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(t)))
    want = gn.resnet_block(x, t, _np(params))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_spatial_transformer_golden():
    rng = np.random.default_rng(2)
    B, H, W, C, heads, depth = 2, 4, 4, 64, 4, 2
    x = rng.standard_normal((B, H, W, C), np.float32)
    ctx = rng.standard_normal((B, 7, 32), np.float32)
    mod = SpatialTransformer(num_heads=heads, head_dim=C // heads, depth=depth)
    params = mod.init(jax.random.PRNGKey(2), jnp.asarray(x), jnp.asarray(ctx))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx)))
    want = gn.spatial_transformer(x, ctx, _np(params), heads, depth=depth)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)


def test_geglu_uses_exact_gelu():
    """The gate must be erf-gelu (torch F.gelu default, diffusers GEGLU) —
    the tanh approximation differs by up to ~1e-3 and would silently shift
    every transformer block's output."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 16), np.float32)
    mod = GEGLUFeedForward(dim=16)
    params = mod.init(jax.random.PRNGKey(3), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    want = gn.geglu_ff(x, _np(params))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_attn_block_2d_golden():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 4, 4, 64), np.float32)
    mod = AttnBlock2D()
    params = mod.init(jax.random.PRNGKey(4), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    want = gn.attn_block_2d(x, _np(params))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_downsample_padding_conventions():
    """VAE encoder downsample pads right/bottom ONLY (diffusers (0,1,0,1));
    UNet downsample pads symmetrically.  A swap changes every activation."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 6, 6, 8), np.float32)
    for asym, oracle in [(True, gn.downsample_vae), (False, gn.downsample_unet)]:
        mod = Downsample(channels=8, asymmetric_pad=asym)
        params = mod.init(jax.random.PRNGKey(5), jnp.asarray(x))["params"]
        got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
        want = oracle(x, _np(params))
        assert got.shape == (1, 3, 3, 8)
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL, err_msg=f"asym={asym}")
    # and the two conventions genuinely differ on the same weights
    mod_a = Downsample(channels=8, asymmetric_pad=True)
    pa = mod_a.init(jax.random.PRNGKey(6), jnp.asarray(x))["params"]
    out_a = np.asarray(mod_a.apply({"params": pa}, jnp.asarray(x)))
    out_s = np.asarray(Downsample(channels=8).apply({"params": pa}, jnp.asarray(x)))
    assert np.abs(out_a - out_s).max() > 1e-3


def test_upsample_golden():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 4, 4, 8), np.float32)
    mod = Upsample(channels=8)
    params = mod.init(jax.random.PRNGKey(7), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    want = gn.upsample(x, _np(params))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_time_embed_mlp_golden():
    rng = np.random.default_rng(7)
    t_emb = rng.standard_normal((3, 32), np.float32)
    mod = TimestepEmbedMLP(dim=64)
    params = mod.init(jax.random.PRNGKey(8), jnp.asarray(t_emb))["params"]
    p = _np(params)
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(t_emb)))
    h = gn.dense(t_emb, p["fc1"]["kernel"], p["fc1"]["bias"])
    want = gn.dense(gn.silu(h), p["fc2"]["kernel"], p["fc2"]["bias"])
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_vae_decoder_golden():
    """Full tiny-config VAE decoder forward vs the NumPy oracle — covers
    conv_in, mid res/attn, the up-block ladder with nearest-2x upsampling,
    and the output GN-SiLU-conv (reference decode path src/models.py:288-292)."""
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    z = np.random.default_rng(8).standard_normal(
        (1, 4, 4, cfg.latent_channels)).astype(np.float32)
    params = vae.init(jax.random.PRNGKey(9), jnp.asarray(z),
                      method=vae.init_all)["params"]
    got = np.asarray(vae.apply({"params": params}, jnp.asarray(z), method=vae.decode))
    p = _np(params)
    # decode = unscale -> post_quant_conv (1x1) -> decoder
    zin = z / cfg.scaling_factor
    zin = gn.conv2d(zin, p["post_quant_conv"]["kernel"], p["post_quant_conv"]["bias"],
                    pad=((0, 0), (0, 0)))
    want = gn.vae_decoder(zin, p["decoder"], cfg.block_out_channels,
                          cfg.layers_per_block, cfg.in_channels)
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)
