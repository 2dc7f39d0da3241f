"""Pallas kernel correctness (interpret mode on CPU) + backend dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.ops.attention import (
    _xla_attention,
    dot_product_attention,
    set_attention_backend,
)
from sonicdiffusionbayeslab_tpu.ops.flash_attention import flash_attention


def rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("layout", ["native", "bh"])
@pytest.mark.parametrize(
    "B,N,M,H,D",
    [
        (1, 256, 256, 2, 40),   # SD self-attn head_dim 40 (lane-padded in VMEM only)
        (2, 300, 77, 2, 64),    # cross-attn: ragged N, short KV
        (1, 512, 512, 1, 128),  # lane-aligned
    ],
)
def test_flash_attention_matches_xla(monkeypatch, layout, B, N, M, H, D):
    monkeypatch.setenv("SDBL_PALLAS_LAYOUT", layout)
    q, k, v = rand((B, N, H, D), 0), rand((B, M, H, D), 1), rand((B, M, H, D), 2)
    got = flash_attention(q, k, v, interpret=True)
    want = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_attention_rejects_unknown_layout(monkeypatch):
    monkeypatch.setenv("SDBL_PALLAS_LAYOUT", "bogus")
    q = rand((1, 8, 1, 16), 0)
    with pytest.raises(ValueError, match="SDBL_PALLAS_LAYOUT"):
        flash_attention(q, q, q, interpret=True)


def test_flash_attention_softmax_stability():
    # Large logits must not overflow (fp32 max-subtraction path).
    q = 50.0 * rand((1, 256, 1, 128), 3)
    k = 50.0 * rand((1, 256, 1, 128), 4)
    v = rand((1, 256, 1, 128), 5)
    out = flash_attention(q, k, v, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_backend_dispatch_explicit():
    q, k, v = rand((1, 8, 1, 16), 0), rand((1, 8, 1, 16), 1), rand((1, 8, 1, 16), 2)
    set_attention_backend("xla")
    try:
        out = dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(_xla_attention(q, k, v)))
        with pytest.raises(ValueError):
            set_attention_backend("bogus")
    finally:
        set_attention_backend(None)


def test_xfmr_barrier_is_exact(monkeypatch):
    """SDBL_XFMR_BARRIER (perf knob, docs/PERF.md): the transformer/conv
    boundary optimization_barrier must be bit-exact — identical outputs
    with the flag on and off, same params."""
    from sonicdiffusionbayeslab_tpu.models.layers import SpatialTransformer

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 32)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24)).astype(np.float32))
    st = SpatialTransformer(num_heads=2, head_dim=16)
    params = st.init(jax.random.PRNGKey(0), x, ctx)["params"]

    monkeypatch.delenv("SDBL_XFMR_BARRIER", raising=False)
    out_off = st.apply({"params": params}, x, ctx)
    monkeypatch.setenv("SDBL_XFMR_BARRIER", "1")
    out_on = st.apply({"params": params}, x, ctx)
    np.testing.assert_array_equal(np.asarray(out_off), np.asarray(out_on))


def test_proj_nhwc_is_exact(monkeypatch):
    """SDBL_PROJ_NHWC (perf knob, docs/PERF.md): applying the boundary
    projections on the rank-4 NHWC map is the same dot_general — identical
    outputs with the flag on and off, same params (Dense contracts the
    last axis at any rank, so the param tree is unchanged too)."""
    from sonicdiffusionbayeslab_tpu.models.layers import SpatialTransformer

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 32)).astype(np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24)).astype(np.float32))
    st = SpatialTransformer(num_heads=2, head_dim=16, cfg_tile=False)
    params = st.init(jax.random.PRNGKey(0), x, ctx)["params"]

    monkeypatch.delenv("SDBL_PROJ_NHWC", raising=False)
    out_off = st.apply({"params": params}, x, ctx)
    monkeypatch.setenv("SDBL_PROJ_NHWC", "1")
    out_on = st.apply({"params": params}, x, ctx)
    np.testing.assert_array_equal(np.asarray(out_off), np.asarray(out_on))

    # cfg_tile entry point (the hero path): latents [B], context [2B].
    st2 = SpatialTransformer(num_heads=2, head_dim=16, cfg_tile=True)
    ctx2 = jnp.concatenate([ctx, ctx], axis=0)
    params2 = st2.init(jax.random.PRNGKey(0), x, ctx2)["params"]
    monkeypatch.delenv("SDBL_PROJ_NHWC", raising=False)
    out_off2 = st2.apply({"params": params2}, x, ctx2)
    monkeypatch.setenv("SDBL_PROJ_NHWC", "1")
    out_on2 = st2.apply({"params": params2}, x, ctx2)
    np.testing.assert_array_equal(np.asarray(out_off2), np.asarray(out_on2))


def test_flash_attention_gradient_matches_xla():
    """The kernel's custom VJP (Pallas forward, closed-form einsum backward)
    must produce the same q/k/v gradients as differentiating the plain XLA
    attention — the rule that makes jax.grad through a training step work
    when the tiered/pallas backend dispatched the kernel."""
    from sonicdiffusionbayeslab_tpu.ops.attention import _xla_attention
    from sonicdiffusionbayeslab_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 16, 2, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 12, 2, 8)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 12, 2, 8)).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((2, 16, 2, 8)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) * co)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) * co)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
