"""Attention dispatch: tiered Pallas/XLA selection on TPU (auto default).

This is the hot op of the UNet and MMDiT (self-attention over
4096/1024/256-token latent grids, the SD3 joint sequence of ~4250 tokens,
and 77-token cross-attention; ~the FLOPs the reference spends in torch CUDA
attention via diffusers, src/models.py:227-235).  The interface is fixed
here so the backend can change without touching model code.

Current default on TPU ('tiered', measured — docs/PERF.md "Current
defaults"): the Pallas flash kernel everywhere XLA would spill fp32
[B,H,N,M] score tensors to HBM — i.e. every self-attention shape except
exactly N=M=4096, where XLA emits a flash-like single fusion at 82% of the
MXU ceiling — VMEM-guarded by ``fits_vmem``.  See ``_xla_spills_scores``
for the measured positive list.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = None  # None = auto


def set_attention_backend(name: Optional[str]) -> None:
    """'xla' | 'pallas' | 'tiered' | None (auto)."""
    global _BACKEND
    if name not in (None, "xla", "pallas", "tiered"):
        raise ValueError(f"unknown attention backend {name!r}")
    _BACKEND = name


def get_attention_backend() -> Optional[str]:
    env = os.environ.get("SDBL_ATTENTION", "").strip().lower() or None
    backend = _BACKEND if _BACKEND is not None else env
    if backend is None and jax.default_backend() == "tpu":
        # Measured default (docs/PERF.md rounds 3-4): tiered = XLA's
        # flash-like fusion where it wins (exactly N=M=4096), Pallas
        # everywhere else — every other self-attention shape spills fp32
        # scores to HBM under XLA (see _xla_spills_scores).  +3% on the
        # SD-1.5 loop, +279% on the SD3 loop (N=4250 fell past the old
        # N<4096 threshold; round-4 fix).  Exact math either way.
        return "tiered"
    return backend


def _xla_attention(q, k, v, mask=None):
    """[B, N, H, D] x [B, M, H, D] -> [B, N, H, D], fp32 softmax."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


def dot_product_attention(q, k, v, mask=None):
    """Heads-separate attention: q [B, N, H, D], k/v [B, M, H, D].

    Backend resolution: explicit set_attention_backend / SDBL_ATTENTION
    env; auto = 'tiered' on TPU, XLA elsewhere.  'tiered' sends a shape to
    the Pallas flash kernel iff XLA would spill fp32 scores for it
    (``_xla_spills_scores`` — every self-attention shape except exactly
    N=M=4096) and the kernel's full-K/V block fits VMEM (``fits_vmem``).
    'pallas' forces the kernel for every unmasked shape that fits VMEM;
    'xla' forces the einsum-softmax path.  History: pure-XLA was the round-2
    default (the pallas_call boundary cost ~18% end-to-end when the kernel
    was used on ALL tiers including N=4096); the round-3/4 measurements
    split the tiers — see docs/PERF.md "Current defaults".  The kernel is
    blockwise — the base a context-parallel axis would build on (SURVEY §5
    long-context note).
    """
    backend = get_attention_backend()
    if backend in ("pallas", "tiered") and mask is None:
        from sonicdiffusionbayeslab_tpu.ops.flash_attention import (
            fits_vmem,
            flash_attention,
        )

        if backend == "tiered" and not _xla_spills_scores(q, k):
            return _xla_attention(q, k, v, mask=mask)
        if fits_vmem(q, k):
            return flash_attention(q, k, v)
        # e.g. the VAE decoder's single-head D=512 mid attention: the
        # single-pass kernel's full-K/V block exceeds scoped VMEM.
    return _xla_attention(q, k, v, mask=mask)


def _xla_spills_scores(q, k) -> bool:
    """Predicate for the 'tiered' backend: dispatch Pallas only where XLA
    materializes fp32 [B,H,N,M] scores to HBM.

    Measured on v5e (docs/PERF.md per-op breakdowns): the ONLY shape where
    XLA emits its flash-like single kOutput fusion (82% of the D=40 MXU
    ceiling — hard to beat) is the exact N=M=4096 self-attention tier.
    Everything else spills fp32 scores and runs HBM-bound:

    * N=M=1024/256 (UNet lower levels): two fusions around a 0.5 GB score
      tensor;
    * ToMe's merged shapes (N=3072/2048): 4.8/2.1 GB score tensors;
    * the MMDiT joint sequence N=M≈4250 (SD3 @1024px): a 3.5 GB score
      tensor per block-chunk — profiled at 0.1 TFLOP/s / 646 GB/s, 56% of
      the SD3 loop's device time (round-4 trace, docs/PERF.md).

    Hence "spills unless exactly 4096": a positive list of the one measured
    non-spilling shape, not a threshold.  Cross-attention (M=77) is too
    small to matter either way.  Shapes whose full-K/V block exceeds the
    kernel's VMEM budget (e.g. a hypothetical N=16k) fall back to XLA via
    ``fits_vmem`` in the caller."""
    N, M = q.shape[1], k.shape[1]
    return M >= 128 and not (N == 4096 and M == 4096)
