"""Int8 W8A8 quantized projections (ops/quant.py + models/layers.QuantDense).

APPROXIMATE perf knob (like ToMe): the tests pin (a) the exact int8
arithmetic against an independent NumPy emulation, (b) the quantization
error bound vs the fp32 matmul, (c) param-tree compatibility with
nn.Dense (converter/LoRA/sharding invariance), and (d) the end-to-end
sampler path under SDBL_QUANT=int8 including trace-cache keying.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.ops.quant import (
    get_quant_mode,
    int8_dense,
    set_quant_mode,
)


def _numpy_w8a8(x, w, b=None):
    """Independent emulation of the documented scheme (not the JAX code)."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)
    s_x = np.maximum(np.max(np.abs(x), axis=-1, keepdims=True), 1e-12) / 127.0
    x_q = np.clip(np.round(x / s_x), -127, 127).astype(np.int32)
    s_w = np.maximum(np.max(np.abs(w), axis=0, keepdims=True), 1e-12) / 127.0
    w_q = np.clip(np.round(w / s_w), -127, 127).astype(np.int32)
    out = (x_q @ w_q) * s_x * s_w
    if b is not None:
        out = out + np.asarray(b, np.float64)
    return out


def test_int8_dense_matches_numpy_emulation_exactly():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 37)).astype(np.float32)
    w = rng.standard_normal((37, 11)).astype(np.float32)
    b = rng.standard_normal((11,)).astype(np.float32)
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                out_dtype=jnp.float32))
    want = _numpy_w8a8(x, w, b)
    # Same int8 grid on both sides -> only fp32-vs-fp64 epilogue rounding.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_dense_batched_rank3():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 7, 16)).astype(np.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w), out_dtype=jnp.float32))
    want = np.stack([_numpy_w8a8(x[i], w) for i in range(2)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quantization_error_bound_vs_fp32():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((64, 320)).astype(np.float32)
    w = (rng.standard_normal((320, 1280)) / np.sqrt(320)).astype(np.float32)
    exact = x @ w
    got = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w), out_dtype=jnp.float32))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    # Two int8 roundings on gaussian data: ~0.4-0.6% relative RMS.
    assert rel < 0.02, rel


def test_quant_dense_param_tree_identical_to_nn_dense():
    from sonicdiffusionbayeslab_tpu.models.layers import QuantDense

    x = jnp.ones((2, 9))
    p_q = QuantDense(4, param_dtype=jnp.bfloat16).init(jax.random.PRNGKey(0), x)["params"]
    p_d = nn.Dense(4, param_dtype=jnp.bfloat16).init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p_q) == jax.tree_util.tree_structure(p_d)
    for a, b in zip(jax.tree_util.tree_leaves(p_q), jax.tree_util.tree_leaves(p_d)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_set_quant_mode_validation():
    with pytest.raises(ValueError):
        set_quant_mode("int4")
    assert get_quant_mode() in (None, "int8")


@pytest.fixture
def quant_int8():
    set_quant_mode("int8")
    try:
        yield
    finally:
        set_quant_mode(None)


def test_projection_dense_dispatch(quant_int8):
    from sonicdiffusionbayeslab_tpu.models.layers import QuantDense, projection_dense

    assert isinstance(projection_dense(4, name="x"), QuantDense)
    set_quant_mode(None)
    assert isinstance(projection_dense(4, name="x"), nn.Dense)


def test_sampler_end_to_end_int8_close_to_fp32(quant_int8):
    """The tiny SD engine samples under quant mode int8: finite output,
    bounded drift vs the exact path, and a distinct trace-cache entry."""
    from sonicdiffusionbayeslab_tpu.models import (
        CLIPTextConfig,
        StableDiffusionEngine,
        UNetConfig,
        VAEConfig,
    )
    from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
    from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

    engine = StableDiffusionEngine(
        UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = engine.init_params(seed=0, latent_hw=8)
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    embeds = engine.encode_prompts(params, tok(["a boat"]))
    neg = engine.encode_prompts(params, tok([""]))
    plan = DPMSolverScheduler(solver_order=2).build_plan(5)
    key = jax.random.PRNGKey(3)
    kw = dict(latent_hw=(8, 8), guidance_scale=7.5, decode=False)

    out_q = engine.sample(params, plan, embeds, neg, key, **kw)
    set_quant_mode(None)
    out_f = engine.sample(params, plan, embeds, neg, key, **kw)

    lat_q = np.asarray(out_q.latents, np.float32)
    lat_f = np.asarray(out_f.latents, np.float32)
    assert np.isfinite(lat_q).all()
    assert lat_q.shape == lat_f.shape
    # Quantization error compounds over steps; demand closeness, not equality.
    rel = np.linalg.norm(lat_q - lat_f) / max(np.linalg.norm(lat_f), 1e-9)
    assert 0.0 < rel < 0.35, rel


# ---------------------------------------------------------------------------
# int8_conv (SDBL_QUANT=int8_conv): the UNet ResNet 3x3 convs
# ---------------------------------------------------------------------------


def _numpy_w8a8_conv(x, w, b=None, pad=1):
    """Independent emulation: per-sample act scale, per-out-channel weight
    scale, integer accumulation via an explicit im2col loop (fp64 holds the
    int32 range exactly)."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)  # [kh, kw, C, O]
    s_x = np.maximum(np.max(np.abs(x), axis=(1, 2, 3), keepdims=True), 1e-12) / 127.0
    x_q = np.clip(np.round(x / s_x), -127, 127)
    s_w = np.maximum(np.max(np.abs(w), axis=(0, 1, 2), keepdims=True), 1e-12) / 127.0
    w_q = np.clip(np.round(w / s_w), -127, 127)
    B, H, W, C = x.shape
    kh, kw, _, O = w.shape
    xp = np.pad(x_q, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = np.zeros((B, H, W, O))
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + H, j:j + W, :]  # [B,H,W,C]
            out += np.einsum("bhwc,co->bhwo", patch, w_q[i, j])
    out = out * s_x * s_w.reshape(1, 1, 1, -1)
    if b is not None:
        out = out + np.asarray(b, np.float64)
    return out


def test_int8_conv_matches_numpy_emulation_exactly():
    from sonicdiffusionbayeslab_tpu.ops.quant import int8_conv

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 6, 5, 7)).astype(np.float32)
    w = rng.standard_normal((3, 3, 7, 9)).astype(np.float32)
    b = rng.standard_normal((9,)).astype(np.float32)
    got = np.asarray(int8_conv(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                               out_dtype=jnp.float32))
    want = _numpy_w8a8_conv(x, w, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_conv_error_bound_vs_fp32():
    from sonicdiffusionbayeslab_tpu.ops.quant import int8_conv

    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 16, 16, 64)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 64, 64)) / np.sqrt(9 * 64)).astype(np.float32)
    exact = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    got = np.asarray(int8_conv(jnp.asarray(x), jnp.asarray(w), out_dtype=jnp.float32))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.02, rel


def test_quant_conv_param_tree_identical_to_nn_conv():
    from sonicdiffusionbayeslab_tpu.models.layers import QuantConv

    x = jnp.ones((1, 4, 4, 5))
    p_q = QuantConv(6, (3, 3), padding=1, param_dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), x)["params"]
    p_c = nn.Conv(6, (3, 3), padding=1, param_dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p_q) == jax.tree_util.tree_structure(p_c)
    for a, b in zip(jax.tree_util.tree_leaves(p_q), jax.tree_util.tree_leaves(p_c)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


@pytest.fixture
def quant_int8_conv():
    set_quant_mode("int8_conv")
    try:
        yield
    finally:
        set_quant_mode(None)


def test_resnet_block_dispatch_and_vae_opt_out(quant_int8_conv):
    """Under int8_conv, UNet ResnetBlocks quantize their 3x3 convs; a
    ResnetBlock with allow_quant=False (the VAE's) is bit-identical to the
    exact path with the same params."""
    from sonicdiffusionbayeslab_tpu.models.layers import ResnetBlock

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((1, 32)).astype(np.float32))

    blk = ResnetBlock(16)
    params = blk.init(jax.random.PRNGKey(0), x, t)["params"]
    out_q = blk.apply({"params": params}, x, t)

    blk_exact = ResnetBlock(16, allow_quant=False)
    out_noq = blk_exact.apply({"params": params}, x, t)

    set_quant_mode(None)
    out_f = blk.apply({"params": params}, x, t)

    # opt-out == exact path bitwise; quantized path differs but is close.
    np.testing.assert_array_equal(np.asarray(out_noq), np.asarray(out_f))
    assert not np.array_equal(np.asarray(out_q), np.asarray(out_f))
    rel = np.linalg.norm(np.asarray(out_q) - np.asarray(out_f)) / np.linalg.norm(np.asarray(out_f))
    assert rel < 0.05, rel


def test_sampler_end_to_end_int8_conv(quant_int8_conv):
    """Tiny engine samples under int8_conv: finite, bounded drift vs exact,
    and the VAE decode path emits identical params/trace structure."""
    from sonicdiffusionbayeslab_tpu.models import (
        CLIPTextConfig,
        StableDiffusionEngine,
        UNetConfig,
        VAEConfig,
    )
    from sonicdiffusionbayeslab_tpu.models.tokenizer import HashTokenizer
    from sonicdiffusionbayeslab_tpu.schedulers import DPMSolverScheduler

    engine = StableDiffusionEngine(
        UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    params = engine.init_params(seed=0, latent_hw=8)
    tok = HashTokenizer(vocab_size=engine.text_config.vocab_size)
    embeds = engine.encode_prompts(params, tok(["a boat"]))
    neg = engine.encode_prompts(params, tok([""]))
    plan = DPMSolverScheduler(solver_order=2).build_plan(5)
    key = jax.random.PRNGKey(3)
    kw = dict(latent_hw=(8, 8), guidance_scale=7.5, decode=False)

    out_q = engine.sample(params, plan, embeds, neg, key, **kw)
    set_quant_mode(None)
    out_f = engine.sample(params, plan, embeds, neg, key, **kw)

    lat_q = np.asarray(out_q.latents, np.float32)
    lat_f = np.asarray(out_f.latents, np.float32)
    assert np.isfinite(lat_q).all()
    rel = np.linalg.norm(lat_q - lat_f) / max(np.linalg.norm(lat_f), 1e-9)
    assert 0.0 < rel < 0.6, rel


def test_sampler_convs_quantize_and_vae_opt_out(quant_int8_conv):
    """Under int8 conv modes the UNet's Downsample/Upsample 3x3s quantize
    (allow_quant=True at the UNet call sites); the default (the VAE's and
    ControlNet's) stays bit-identical to the exact path, same param tree."""
    from sonicdiffusionbayeslab_tpu.models.layers import Downsample, Upsample

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))

    for mod_q, mod_d in [
        (Downsample(16, allow_quant=True), Downsample(16)),
        (Upsample(16, allow_quant=True), Upsample(16)),
    ]:
        params = mod_q.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree.structure(params) == jax.tree.structure(
            mod_d.init(jax.random.PRNGKey(0), x)["params"]
        )
        out_q = mod_q.apply({"params": params}, x)
        out_default = mod_d.apply({"params": params}, x)
        set_quant_mode(None)
        out_f = mod_q.apply({"params": params}, x)
        set_quant_mode("int8_conv")
        np.testing.assert_array_equal(np.asarray(out_default), np.asarray(out_f))
        assert not np.array_equal(np.asarray(out_q), np.asarray(out_f))
        rel = np.linalg.norm(np.asarray(out_q) - np.asarray(out_f)) / np.linalg.norm(
            np.asarray(out_f)
        )
        assert rel < 0.05, rel


def test_int8_conv_only_mode_dispatch():
    """'int8_conv_only' (the measured-best v5e mode, docs/PERF.md): ResNet
    convs quantize, projections stay exact nn.Dense."""
    from sonicdiffusionbayeslab_tpu.models.layers import projection_dense
    from sonicdiffusionbayeslab_tpu.ops.quant import (
        conv_quant_enabled,
        dense_quant_enabled,
    )

    set_quant_mode("int8_conv_only")
    try:
        assert conv_quant_enabled() and not dense_quant_enabled()
        assert isinstance(projection_dense(4, name="x"), nn.Dense)
    finally:
        set_quant_mode(None)
