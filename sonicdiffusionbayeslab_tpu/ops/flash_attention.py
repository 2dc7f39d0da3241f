"""Pallas TPU attention kernel for the UNet/VAE hot path.

Shapes this serves (SD-1.5 @512px): self-attention over 4096/1024/256/64
latent tokens with head_dim 40-160 (VAE mid: 4096 tokens, one 512-d head),
and 77-token cross-attention.  At these sizes the whole K/V block fits VMEM,
so the kernel is a single-pass blocked attention: each program owns one
(batch, head, q-block) tile, streams K/V from VMEM once, does the fp32
softmax on-chip, and writes the [BLOCK_Q, D] output tile.  No online-softmax
rescan is needed below ~16k tokens — simpler and faster than a generic
flash loop at SD scale.

Layout contract (round-2 fix of the measured r1 loss): head_dim is NOT
padded in HBM — SD's D=40 heads were previously zero-padded to 128 lanes
*in memory*, a 3.2x inflation of every q/k/v read and o write that cost the
kernel its end-to-end win (docs/PERF.md).  Lane padding now happens only in
VMEM (Mosaic's implicit tiling).  Two block layouts are selectable with
``SDBL_PALLAS_LAYOUT``:

* ``bh`` (default): one XLA moveaxis to [B*H, N, D] first — contiguous DMA
  rows, one relayout (often fused into the producing projection).
* ``native`` (experimental): blocks sliced straight from the model's
  [B, N, H, D] tensors — zero relayout ops.  Correct in interpret mode, but
  current Mosaic cannot lower the per-head [BQ, D] -> [1, BQ, 1, D] store
  shape cast on hardware ("infer-vector-layout: unsupported shape cast"),
  so it is not usable on real TPUs yet (measured r2; see docs/PERF.md).

Sequence padding: KV length is zero-padded to a sublane multiple with -inf
masking of the padded columns; Q length is padded and sliced.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _rows(ref):
    """Block -> [rows, D]: (1, L, 1, D) native or (1, L, D) bh layout."""
    x = ref[...]
    return x.reshape(x.shape[-3] if x.ndim == 4 else x.shape[-2], x.shape[-1])


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, m_valid: int):
    q = _rows(q_ref).astype(jnp.float32)  # [BQ, D]
    k = _rows(k_ref).astype(jnp.float32)  # [M, D]
    v = _rows(v_ref)  # [M, D]
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
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)
    o_ref[...] = o.reshape(o_ref.shape)


def _attn_kernel_native(q_ref, k_ref, v_ref, o_ref, *, scale: float, m_valid: int):
    """Blocks carry ALL heads: q [1, BQ, H, D], k/v [1, M, H, D] (Mosaic
    requires the last two block dims = array dims here, and full-H blocks
    make every DMA row fully contiguous).  Heads unroll in-kernel."""
    H = q_ref.shape[2]
    for h in range(H):
        q = q_ref[0, :, h, :].astype(jnp.float32)  # [BQ, D]
        k = k_ref[0, :, h, :].astype(jnp.float32)  # [M, D]
        v = v_ref[0, :, h, :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if m_valid < k.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < m_valid, logits, jnp.finfo(jnp.float32).min)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
        o_ref[0, :, h, :] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _flash_native(q, k, v, *, interpret: bool) -> jax.Array:
    """Blocks sliced straight from [B, N, H, D]; grid (B, N-blocks); zero
    relayout ops in XLA, fully contiguous [BQ, H*D] DMA rows."""
    B, N, H, D = q.shape
    M = k.shape[1]
    scale = float(D) ** -0.5
    BQ = 256 if N >= 256 else _ceil_to(N, 8)
    Np, Mp = _ceil_to(N, BQ), _ceil_to(M, 8)
    if Np != N:
        q = jnp.pad(q, ((0, 0), (0, Np - N), (0, 0), (0, 0)))
    if Mp != M:
        k = jnp.pad(k, ((0, 0), (0, Mp - M), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Mp - M), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_attn_kernel_native, scale=scale, m_valid=M),
        grid=(B, Np // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, H, D), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, H, D), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, H, D), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, H, D), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, H, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * M * D,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * N * M,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :N] if Np != N else out


def _flash_bh(q, k, v, *, interpret: bool) -> jax.Array:
    """One moveaxis to [B*H, N, D] (contiguous rows), grid (B*H, N-blocks)."""
    B, N, H, D = q.shape
    M = k.shape[1]
    scale = float(D) ** -0.5
    BQ = 256 if N >= 256 else _ceil_to(N, 8)
    Np, Mp = _ceil_to(N, BQ), _ceil_to(M, 8)

    def to_bh(x, L, Lp):
        x = jnp.moveaxis(x, 2, 1).reshape(B * H, L, D)
        return jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0))) if Lp != L else x

    qp, kp, vp = to_bh(q, N, Np), to_bh(k, M, Mp), to_bh(v, M, Mp)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, m_valid=M),
        grid=(B * H, Np // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mp, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Np, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * M * D,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=B * H * N * M,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out = out[:, :N].reshape(B, H, N, D)
    return jnp.moveaxis(out, 1, 2)


def fits_vmem(q: jax.Array, k: jax.Array, budget_bytes: int = 12 << 20) -> bool:
    """Whether the single-pass kernel's per-program VMEM footprint fits.

    The kernel streams FULL K/V per (row, q-block) program — right for the
    UNet's skinny heads (D=40), but a VAE-decoder mid-attention at
    M=4096, D=512 needs ~17 MB (> the 16 MB scoped VMEM) and must fall
    back to XLA.  Footprint: bf16 q/k/v/out blocks + the fp32 [BQ, M]
    logits and [BQ, D] accumulator."""
    B, N, H, D = q.shape
    M = k.shape[1]
    BQ = 256 if N >= 256 else _ceil_to(N, 8)
    Mp = _ceil_to(M, 8)
    itemsize = q.dtype.itemsize
    # The native layout's blocks carry the full head axis ([1, BQ, H, D] q/out
    # and [1, Mp, H, D] k/v), H x the per-head `bh` blocks — the guard must
    # model the layout that will actually dispatch.
    h_mult = H if os.environ.get("SDBL_PALLAS_LAYOUT", "bh").strip().lower() == "native" else 1
    blocks = (2 * BQ * D + 2 * Mp * D) * itemsize * h_mult  # q + out + k + v
    scratch = BQ * Mp * 4 + BQ * D * 4  # fp32 logits + accumulator
    return blocks + scratch <= budget_bytes


def _dispatch(q, k, v, interpret: bool) -> jax.Array:
    layout = os.environ.get("SDBL_PALLAS_LAYOUT", "bh").strip().lower()
    if layout == "native":
        return _flash_native(q, k, v, interpret=interpret)
    if layout != "bh":
        raise ValueError(f"unknown SDBL_PALLAS_LAYOUT {layout!r} (bh | native)")
    return _flash_bh(q, k, v, interpret=interpret)


# Reverse-mode rule: pallas_call has no built-in VJP, and the tiered backend
# is the TPU DEFAULT — without this, any jax.grad through an attention that
# dispatched the kernel (e.g. a training step on hardware) dies with
# "Linearization failed".  Forward stays the Pallas kernel; the backward is
# the exact closed-form attention gradient in fp32 XLA einsums
# (dS = P ∘ (dP − rowsum(dP ∘ P)) with P recomputed from q/k — the standard
# softmax-attention VJP).  It materializes the [B, H, N, M] score tensor in
# the backward only, i.e. training through the kernel pays the memory the
# inference path avoids; a blocked Pallas backward can replace this without
# touching callers.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_autodiff(q, k, v, interpret: bool):
    return _dispatch(q, k, v, interpret)


def _flash_fwd(q, k, v, interpret: bool):
    return _dispatch(q, k, v, interpret), (q, k, v)


def _flash_bwd(interpret: bool, res, do):
    q, k, v = res
    scale = float(q.shape[-1]) ** -0.5
    qf, kf, vf, dof = (x.astype(jnp.float32) for x in (q, k, v, do))
    logits = jnp.einsum("bnhd,bmhd->bhnm", qf, kf) * scale
    p = jax.nn.softmax(logits, axis=-1)
    dv = jnp.einsum("bhnm,bnhd->bmhd", p, dof)
    dp = jnp.einsum("bnhd,bmhd->bhnm", dof, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bmhd->bnhd", ds, kf) * scale
    dk = jnp.einsum("bhnm,bnhd->bmhd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_autodiff.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, interpret: bool = False) -> jax.Array:
    """q [B, N, H, D], k/v [B, M, H, D] -> [B, N, H, D].  fp32 softmax.

    Differentiable: reverse-mode goes through the custom VJP above."""
    B, N, H, D = q.shape
    M = k.shape[1]
    if k.shape != (B, M, H, D) or v.shape != (B, M, H, D):
        raise ValueError(f"kv shape mismatch: {q.shape} vs {k.shape}/{v.shape}")
    return _flash_autodiff(q, k, v, interpret)
