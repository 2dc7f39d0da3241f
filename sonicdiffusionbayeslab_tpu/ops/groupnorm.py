"""Fused GroupNorm(+SiLU) Pallas kernel.

GroupNorm -> SiLU is the elementwise prologue of every UNet/VAE resnet block
(reference hits it inside torch's fused CUDA kernels via diffusers).  XLA
fuses most of it already; this kernel removes the remaining HBM round trip
by computing group statistics and the normalized/activated output in one
VMEM residency per (batch, spatial-block) tile, with a two-phase grid:
phase 0 accumulates per-group sum/sumsq into a scratch accumulator across
spatial blocks (TPU grids execute sequentially per core, so cross-step
scratch accumulation is sound), phase 1 replays the tiles and applies
normalize+affine+SiLU.

Enabled via SDBL_GROUPNORM=pallas (off by default pending on-hardware wins;
the XLA path is `models/layers.py::GroupNorm`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, gamma_ref, beta_ref, o_ref, acc_ref, *, groups: int, eps: float,
            n_total: int, silu: bool):
    # Grid (B, 2, S): per batch item, phase 0 (stats) sweeps spatial blocks
    # then phase 1 (apply) replays them — so the scratch accumulator is
    # naturally per-batch-item.
    phase = pl.program_id(1)
    s = pl.program_id(2)  # spatial block index
    x = x_ref[0].astype(jnp.float32)  # [BS, C]
    C = x.shape[-1]
    gs = C // groups

    @pl.when(phase == 0)
    def _stats():
        @pl.when(s == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        xg = x.reshape(x.shape[0], groups, gs)
        acc_ref[0, :] += jnp.sum(xg, axis=(0, 2))
        acc_ref[1, :] += jnp.sum(xg * xg, axis=(0, 2))

    @pl.when(phase == 1)
    def _apply():
        n = jnp.float32(n_total)
        mean = acc_ref[0, :] / n  # [G]
        var = acc_ref[1, :] / n - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        mean_c = jnp.repeat(mean, gs)  # [C]
        inv_c = jnp.repeat(inv, gs)
        y = (x - mean_c[None, :]) * inv_c[None, :]
        y = y * gamma_ref[0].astype(jnp.float32)[None, :] + beta_ref[0].astype(jnp.float32)[None, :]
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


def _gn_silu_ref(x, gamma, beta, groups: int, eps: float, silu: bool):
    """Pure-XLA GroupNorm(+SiLU) with the kernel's exact fp32 statistics —
    the function whose VJP backs the Pallas forward below."""
    B, C = x.shape[0], x.shape[-1]
    xf = x.astype(jnp.float32).reshape(B, -1, groups, C // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


# pallas_call has no VJP — without a custom rule, enabling SDBL_GROUPNORM=
# pallas during training dies at trace time.  Backward = jax.vjp of the
# XLA reference above (same statistics, exact gradient).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _gn_pallas(x, gamma, beta, groups, eps, silu, block_rows, interpret):
    return _gn_pallas_impl(x, gamma, beta, groups, eps, silu, block_rows, interpret)


def _gn_fwd(x, gamma, beta, groups, eps, silu, block_rows, interpret):
    out = _gn_pallas_impl(x, gamma, beta, groups, eps, silu, block_rows, interpret)
    return out, (x, gamma, beta)


def _gn_bwd(groups, eps, silu, block_rows, interpret, res, do):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda a, g, b: _gn_silu_ref(a, g, b, groups, eps, silu), x, gamma, beta
    )
    return vjp(do)


_gn_pallas.defvjp(_gn_fwd, _gn_bwd)


def group_norm_silu(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    groups: int = 32,
    eps: float = 1e-5,
    silu: bool = True,
    block_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x [B, H, W, C] (or [B, N, C]) -> GroupNorm(+SiLU), fp32 statistics.

    Differentiable (custom VJP; backward is the exact XLA gradient)."""
    C = x.shape[-1]
    if C % groups:
        raise ValueError(f"channels {C} not divisible by groups {groups}")
    N = 1
    for d in x.shape[1:-1]:
        N *= d
    BS = min(block_rows, N)
    if N % BS:
        raise ValueError(f"spatial size {N} not divisible by block {BS}")
    return _gn_pallas(x, gamma, beta, groups, eps, silu, block_rows, interpret)


def _gn_pallas_impl(x, gamma, beta, groups, eps, silu, block_rows, interpret):
    orig_shape = x.shape
    B, C = x.shape[0], x.shape[-1]
    N = 1
    for d in x.shape[1:-1]:
        N *= d
    x2 = x.reshape(B, N, C)
    BS = min(block_rows, N)
    n_blocks = N // BS

    out = pl.pallas_call(
        functools.partial(
            _kernel, groups=groups, eps=eps, n_total=N * (C // groups), silu=silu
        ),
        grid=(B, 2, n_blocks),
        in_specs=[
            pl.BlockSpec((1, BS, C), lambda b, p, s: (b, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BS, C), lambda b, p, s: (b, s, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, groups), jnp.float32)],
        interpret=interpret,
    )(x2, gamma.reshape(1, C), beta.reshape(1, C))
    return out.reshape(orig_shape)
