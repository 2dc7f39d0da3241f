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
