"""Fused GroupNorm+SiLU Pallas kernel vs flax reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.ops.groupnorm import group_norm_silu


@pytest.mark.parametrize("B,H,W,C,groups,blocks", [
    (2, 8, 8, 64, 32, 64),     # single spatial block
    (1, 16, 16, 32, 8, 64),    # multi-block accumulation (256 rows / 64)
])
def test_group_norm_silu_matches_flax(B, H, W, C, groups, blocks):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)) * 3 + 1, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(C), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(C), jnp.float32)

    got = group_norm_silu(x, gamma, beta, groups=groups, block_rows=blocks, interpret=True)

    gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    ref = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    ref = ref * jax.nn.sigmoid(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_group_norm_no_silu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32)
    gamma, beta = jnp.ones(32), jnp.zeros(32)
    got = group_norm_silu(x, gamma, beta, groups=4, silu=False, interpret=True)
    ref = nn.GroupNorm(num_groups=4, epsilon=1e-5).apply(
        {"params": {"scale": gamma, "bias": beta}}, x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_group_norm_validates():
    x = jnp.zeros((1, 4, 4, 30))
    with pytest.raises(ValueError, match="divisible"):
        group_norm_silu(x, jnp.ones(30), jnp.zeros(30), groups=32, interpret=True)


def test_groupnorm_kernel_gradient_matches_xla():
    """Custom VJP: Pallas forward, exact XLA backward — gradients for x,
    gamma, beta match differentiating the plain GroupNorm+SiLU."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))
    gamma = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    co = jnp.asarray(rng.standard_normal((2, 4, 4, 8)).astype(np.float32))

    def ref(x, gamma, beta):
        xf = x.reshape(2, -1, 4, 2)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y.reshape(x.shape) * gamma + beta
        return y * jax.nn.sigmoid(y)

    def loss_k(x, gamma, beta):
        return jnp.sum(group_norm_silu(x, gamma, beta, groups=4, interpret=True) * co)

    def loss_r(x, gamma, beta):
        return jnp.sum(ref(x, gamma, beta) * co)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
