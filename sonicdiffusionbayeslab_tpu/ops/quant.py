"""Int8 W8A8 dynamic-quantized matmul for the UNet transformer projections.

TPU v5e's MXU executes int8 x int8 -> int32 at 2x the bf16 peak (394 vs
197 TOP/s), so routing the big projection/FFN matmuls (the per-op
profile's "other conv/matmul" bucket, docs/PERF.md) through int8 trades a
bounded quantization error for MXU headroom.  APPROXIMATE, like Token
Merging (ops/tome.py): off by default, enabled with ``SDBL_QUANT=int8``
or :func:`set_quant_mode`, and never part of the exact headline numbers.

Two levels, both dynamic (no calibration pass):

* ``SDBL_QUANT=int8`` — the transformer projections (q/k/v/o, GEGLU FFN,
  proj_in/out) via :func:`int8_dense`
* ``SDBL_QUANT=int8_conv`` — additionally the UNet ResNet 3x3 convs via
  :func:`int8_conv` (the profile's conv buckets, ~38% of step time); the
  VAE's ResnetBlocks stay exact (``allow_quant=False`` — decode quality is
  not worth trading, and decode is outside the loop-only protocol anyway)

Scheme (the standard dynamic W8A8 recipe):

* weights: symmetric per-OUTPUT-CHANNEL int8 — ``s_w[j] = max|w[:, j]|/127``
* activations: symmetric per-TOKEN int8 — ``s_x[i] = max|x[i, :]|/127``,
  computed on the fly (no calibration pass; diffusion activations change
  every step, so static scales would need SmoothQuant-style migration)
* accumulation in int32 on the MXU, dequant in the fp32 epilogue:
  ``y = (x_q @ w_q) * s_x[:, None] * s_w[None, :] + b``

Both scale grids are exact for the rows/columns they cover, so the only
error is the int8 rounding of each operand: relative RMS error ~0.4% per
matmul on gaussian data (tests/test_ops_quant.py pins the bound).

The quantized layer (:class:`QuantDense` in models/layers.py) keeps
``nn.Dense``'s exact param tree — bf16 master weights, quantized at trace
time — so every checkpoint converter, LoRA merge, and sharding rule works
unchanged, and XLA's while-loop invariant code motion hoists the weight
quantization out of the sampling scan.

Reference counterpart: none — the reference runs fp16 CUDA matmuls via
diffusers (src/models.py:227-235); this is a TPU-specific throughput
lever.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_MODE = None  # None = resolve from env

_MODES = (None, "int8", "int8_conv", "int8_conv_only")


def set_quant_mode(mode: Optional[str]) -> None:
    """'int8' (projections/FFN) | 'int8_conv' (projections + ResNet 3x3
    convs) | 'int8_conv_only' (ResNet convs, projections stay bf16 — the
    measured-best mode: on v5e the projections' per-token quantize overhead
    eats their MXU gain, docs/PERF.md) | None (off)."""
    global _MODE
    if mode not in _MODES:
        raise ValueError(f"unknown quant mode {mode!r}")
    _MODE = mode


def get_quant_mode() -> Optional[str]:
    if _MODE is not None:
        return _MODE
    env = os.environ.get("SDBL_QUANT", "").strip().lower() or None
    if env not in _MODES:
        raise ValueError(
            f"unknown SDBL_QUANT {env!r} (int8 | int8_conv | int8_conv_only | unset)"
        )
    return env


def dense_quant_enabled() -> bool:
    """int8 projections are active ('int8' and 'int8_conv' modes)."""
    return get_quant_mode() in ("int8", "int8_conv")


def conv_quant_enabled() -> bool:
    """int8 ResNet convs are active ('int8_conv' / 'int8_conv_only')."""
    return get_quant_mode() in ("int8_conv", "int8_conv_only")


def _quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 over the last axis: returns (q [..., K] int8, scale [..., 1] f32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """W8A8 matmul: x [..., K] @ kernel [K, F] with dynamic int8 quantization."""
    x_q, s_x = _quantize_rows(x)
    w_q, s_w = _quantize_rows(kernel.T)  # per-output-channel -> rows of W^T
    acc = jax.lax.dot_general(
        x_q,
        w_q.T,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s_x * s_w.reshape((1,) * (x.ndim - 1) + (-1,))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype or x.dtype)


def int8_conv(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    strides: tuple[int, int] = (1, 1),
    padding=((1, 1), (1, 1)),
    out_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """W8A8 conv: x [B,H,W,C] * kernel [kh,kw,C,O] with dynamic int8 quant.

    Scale granularity is the conv analog of :func:`int8_dense`'s
    per-token/per-channel grid: activations per-SAMPLE (conv never mixes
    batch rows, so ``s_x[b]`` factors out of every output pixel of sample
    b), weights per-OUTPUT-CHANNEL.  Zero padding is exact in int8, and the
    MXU accumulates the implicit GEMM in int32 (v5e int8 peak = 2x bf16).
    """
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    kf = kernel.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2), keepdims=True), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s_x * s_w.reshape(1, 1, 1, -1)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype or x.dtype)
