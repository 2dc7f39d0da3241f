"""Pallas TPU attention kernel for the UNet/VAE hot path.

Shapes this serves (SD-1.5 @512px): self-attention over 4096/1024/256/64
latent tokens with head_dim 40-160 (VAE mid: 4096 tokens, one 512-d head),
and 77-token cross-attention.  At these sizes the whole K/V block fits VMEM,
so the kernel is a single-pass blocked attention: each program owns one
(batch*head, q-block) tile, streams K/V from VMEM once, does the fp32
softmax on-chip, and writes the [BLOCK_Q, D] output tile.  No online-softmax
rescan is needed below ~16k tokens — simpler and faster than a generic
flash loop at SD scale.

Padding contract (TPU tiling): head_dim is zero-padded to a lane multiple
(128) — zero dims add nothing to q.k logits and produce zero output columns
that are sliced off; the KV length is zero-padded to a sublane multiple with
-inf masking of the padded columns; the Q length is padded and sliced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, m_valid: int):
    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    k = k_ref[0].astype(jnp.float32)  # [M, D]
    v = v_ref[0]  # [M, D]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, M]
    if m_valid < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < m_valid, logits, jnp.finfo(jnp.float32).min)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, interpret: bool = False) -> jax.Array:
    """q [B, N, H, D], k/v [B, M, H, D] -> [B, N, H, D].  fp32 softmax."""
    B, N, H, D = q.shape
    M = k.shape[1]
    if k.shape != (B, M, H, D) or v.shape != (B, M, H, D):
        raise ValueError(f"kv shape mismatch: {q.shape} vs {k.shape}/{v.shape}")

    scale = float(D) ** -0.5
    Dp = _ceil_to(D, 128)
    BQ = 256 if N >= 256 else _ceil_to(N, 8)
    Np = _ceil_to(N, BQ)
    Mp = _ceil_to(M, 128)

    # [B, N, H, D] -> [B*H, N, Dp]
    def to_bh(x, L, Lp):
        x = jnp.moveaxis(x, 2, 1).reshape(B * H, L, D)
        return jnp.pad(x, ((0, 0), (0, Lp - L), (0, Dp - D)))

    qp, kp, vp = to_bh(q, N, Np), to_bh(k, M, Mp), to_bh(v, M, Mp)

    grid = (B * H, Np // BQ)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, m_valid=M),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, Dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, Dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, Dp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * M * D,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=B * H * N * M,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :N, :D].reshape(B, H, N, D)
    return jnp.moveaxis(out, 1, 2)
