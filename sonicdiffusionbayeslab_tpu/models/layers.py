"""Shared Flax building blocks for the SD model stack (TPU-first).

Replaces the diffusers/torch module zoo the reference leans on through pip
(SURVEY §2.2: UNet2DConditionModel / AutoencoderKL / CLIPTextModel CUDA
kernels invoked from src/models.py:227-235, 288-292, 139-149).

TPU conventions used throughout:
* NHWC activations (feature-minor = lane dimension; XLA's native conv layout
  on TPU) — never NCHW.
* ``dtype`` is the compute dtype (bf16 on TPU), ``param_dtype`` the storage
  dtype; GroupNorm statistics and softmax run in fp32.
* Attention goes through :func:`sonicdiffusionbayeslab_tpu.ops.attention`
  so the Pallas flash kernel can be swapped in behind a flag.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.ops.attention import dot_product_attention


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with W8A8 int8 matmul (ops/quant.py).

    Param tree is IDENTICAL to ``nn.Dense`` (bf16 master ``kernel``/``bias``,
    same initializers), so converters, LoRA merges and sharding rules apply
    unchanged; the int8 quantization happens at trace time in the forward.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from sonicdiffusionbayeslab_tpu.ops.quant import int8_dense

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features), self.param_dtype
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        return int8_dense(x, kernel, bias, out_dtype=self.dtype or x.dtype)


def projection_dense(features: int, *, use_bias: bool = True, dtype=None,
                     param_dtype=jnp.float32, name: str):
    """Dense factory for the transformer projections/FFN: ``nn.Dense``, or
    :class:`QuantDense` under ``SDBL_QUANT=int8`` (APPROXIMATE — see
    ops/quant.py; resolved at trace time, keyed into the sampler's trace
    cache like the attention backend)."""
    from sonicdiffusionbayeslab_tpu.ops.quant import dense_quant_enabled

    cls = QuantDense if dense_quant_enabled() else nn.Dense
    return cls(features, use_bias=use_bias, dtype=dtype, param_dtype=param_dtype, name=name)


class QuantConv(nn.Module):
    """Drop-in ``nn.Conv`` (NHWC/HWIO) with W8A8 int8 conv (ops/quant.py).

    Param tree is IDENTICAL to ``nn.Conv`` (bf16 master ``kernel``/``bias``),
    so converters, LoRA merges and sharding rules apply unchanged; the int8
    quantization happens at trace time in the forward.
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from sonicdiffusionbayeslab_tpu.ops.quant import int8_conv

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        pad = self.padding
        pad_pairs = ((pad, pad), (pad, pad)) if isinstance(pad, int) else pad
        return int8_conv(
            x, kernel, bias,
            strides=tuple(self.strides), padding=pad_pairs,
            out_dtype=self.dtype or x.dtype,
        )


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding, [B] -> [B, dim] (fp32)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedMLP(nn.Module):
    """time_embedding: sinusoid -> Linear -> SiLU -> Linear (4x widening).

    ``cond`` (diffusers TimestepEmbedding.cond_proj): an extra conditioning
    vector — LCM full models' guidance(w) embedding — projected bias-free
    onto the sinusoid and ADDED before fc1."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jax.Array, cond: Optional[jax.Array] = None) -> jax.Array:
        if cond is not None:
            t_emb = t_emb + nn.Dense(
                t_emb.shape[-1], use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype, name="cond_proj",
            )(cond.astype(self.dtype))
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(h)


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics regardless of compute dtype.

    Backends: XLA (default; jnp reduction XLA fuses with the following
    activation/conv) or the fused Pallas kernel (``SDBL_GROUPNORM=pallas``,
    ops/groupnorm.py) when on TPU and the spatial extent tiles evenly.
    Optionally fuses the SiLU that always follows it in resnet blocks.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    silu: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import math
        import os

        channels = x.shape[-1]
        groups = self.num_groups if channels % self.num_groups == 0 else math.gcd(
            channels, self.num_groups
        )
        scale = self.param("scale", nn.initializers.ones, (channels,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (channels,), self.param_dtype)

        use_pallas = (
            os.environ.get("SDBL_GROUPNORM", "") == "pallas"
            and jax.default_backend() == "tpu"
            and x.ndim == 4
        )
        if use_pallas:
            n = x.shape[1] * x.shape[2]
            block = 512 if n % 512 == 0 else (n if n <= 4096 else 0)
            if block:
                from sonicdiffusionbayeslab_tpu.ops.groupnorm import group_norm_silu

                return group_norm_silu(
                    x, scale, bias, groups=groups, eps=self.epsilon,
                    silu=self.silu, block_rows=block,
                )

        barrier = os.environ.get("SDBL_GN_BARRIER",
                                 "1" if jax.default_backend() == "tpu" else "")
        if barrier and barrier != "0":
            # Keep the fp32 stats reduction OUT of the producing conv's
            # epilogue. The profiler shows conv+GN-stats "convert_reduce"
            # fusions running at ~140 TFLOP/s vs ~185 for pure convs
            # (docs/PERF.md breakdown): the epilogue reduce serializes VPU
            # work against the MXU tiles. The barrier makes the conv pure;
            # re-reading the activations for stats is bandwidth-cheap.
            # Default ON for TPU (measured +3% end-to-end, exact math;
            # docs/PERF.md round 3); SDBL_GN_BARRIER=0 disables.
            x = jax.lax.optimization_barrier(x)

        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        shape = xf.shape
        xg = xf.reshape(shape[:-1] + (groups, channels // groups))
        red_axes = tuple(range(1, xf.ndim - 1)) + (xf.ndim,)
        mean = jnp.mean(xg, axis=red_axes, keepdims=True)
        var = jnp.mean((xg - mean) ** 2, axis=red_axes, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = xg.reshape(shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        if self.silu:
            out = nn.silu(out)
        return out.astype(orig_dtype)


class ResnetBlock(nn.Module):
    """GN -> SiLU -> conv3x3 -> (+time) -> GN -> SiLU -> conv3x3, + skip.

    ``norm_epsilon``: 1e-5 matches diffusers' UNet resnets (norm_eps); the
    VAE passes 1e-6 (AutoencoderKL convention).

    ``allow_quant``: under ``SDBL_QUANT=int8_conv`` the two 3x3 convs run
    W8A8 int8 (ops/quant.py, APPROXIMATE); the VAE passes False so decode
    stays exact.  The shortcut 1x1 (the residual path) is never quantized."""

    out_channels: int
    norm_epsilon: float = 1e-5
    allow_quant: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, t_emb: Optional[jax.Array] = None) -> jax.Array:
        from sonicdiffusionbayeslab_tpu.ops.quant import conv_quant_enabled

        conv_cls = QuantConv if (self.allow_quant and conv_quant_enabled()) else nn.Conv
        conv = lambda name: conv_cls(  # noqa: E731
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        h = GroupNorm(silu=True, epsilon=self.norm_epsilon,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="norm1")(x)
        h = conv("conv1")(h)
        if t_emb is not None:
            t = nn.Dense(
                self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype, name="time_emb_proj"
            )(nn.silu(t_emb))
            h = h + t[:, None, None, :]
        h = GroupNorm(silu=True, epsilon=self.norm_epsilon,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="norm2")(h)
        h = conv("conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, param_dtype=self.param_dtype, name="conv_shortcut"
            )(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention over [B, N, C] with optional cross context.

    ``SDBL_FUSED_QKV=1`` fuses the q/k/v projections into one matmul
    (qkv for self-attention, kv for cross-attention): one pass over the
    activations instead of three (SURVEY P6).  NB: the fused variant has a
    different param tree (``to_qkv``/``to_kv``) — benchmark-only until the
    weight converter grows fused-entry support.
    """

    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None, mask=None,
                 ip_context: Optional[jax.Array] = None, ip_scale=1.0) -> jax.Array:
        import os

        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        dense = lambda feats, name: projection_dense(  # noqa: E731
            feats, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        if os.environ.get("SDBL_FUSED_QKV", "") == "1":
            if context is None:
                q, k, v = jnp.split(dense(inner * 3, "to_qkv")(x), 3, axis=-1)
            else:
                q = dense(inner, "to_q")(x)
                k, v = jnp.split(dense(inner * 2, "to_kv")(ctx), 2, axis=-1)
        else:
            q = dense(inner, "to_q")(x)
            k = dense(inner, "to_k")(ctx)
            v = dense(inner, "to_v")(ctx)

        B, N, _ = q.shape
        M = k.shape[1]
        q = q.reshape(B, N, self.num_heads, self.head_dim)
        k = k.reshape(B, M, self.num_heads, self.head_dim)
        v = v.reshape(B, M, self.num_heads, self.head_dim)

        o = dot_product_attention(q, k, v, mask=mask)
        o = o.reshape(B, N, inner)
        if ip_context is not None:
            # IP-Adapter decoupled cross-attention (Ye et al. 2023): a second
            # attention over the image-prompt tokens with its OWN k/v
            # projections, sharing q, summed (scaled) BEFORE to_out.
            P = ip_context.shape[1]
            k_ip = dense(inner, "to_k_ip")(ip_context).reshape(B, P, self.num_heads, self.head_dim)
            v_ip = dense(inner, "to_v_ip")(ip_context).reshape(B, P, self.num_heads, self.head_dim)
            o_ip = dot_product_attention(q, k_ip, v_ip)
            o = o + jnp.asarray(ip_scale, o.dtype) * o_ip.reshape(B, N, inner)
        return projection_dense(
            self.out_dim or x.shape[-1], dtype=self.dtype, param_dtype=self.param_dtype, name="to_out"
        )(o)


class GEGLUFeedForward(nn.Module):
    """Transformer FF with GEGLU gate (SD convention), 4x widening."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.dim * self.mult
        h = projection_dense(inner * 2, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU applies torch F.gelu's default = EXACT erf gelu,
        # not the tanh approximation jax.nn.gelu defaults to.
        h = h * nn.gelu(gate, approximate=False)
        return projection_dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out")(h)


class TransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU FF (pre-norm residuals).

    ``cfg_tile``: CFG shared-prefix mode (docs/PERF.md) — ``x`` arrives as
    the SINGLE latent copy [B, N, C] while ``context`` is the CFG-doubled
    [2B, T, C].  Everything up to and including the self-attention is
    computed once (the two CFG halves are bit-identical there: same
    latents, same timestep) and tiled to 2B right before the
    cross-attention, where the [neg|pos] contexts first diverge.

    ``tome``: Token Merging (ops/tome.py) — the most redundant tokens are
    merged away around attn1 (merge the normed input, un-merge the
    attention output; the paper's ToMeSD hook placement), shrinking the
    quadratic self-attention.  ``tome_hw`` carries the static 2D map shape
    for the strided destination partition; ``tome_key`` varies the in-cell
    destination per diffusion step.  ``tome_cache`` (a per-UNet-call dict)
    shares one matching per (H, W, B) across that level's blocks when
    ``tome.share`` — the measured-on-v5e default (ops/tome.py docstring).
    """

    num_heads: int
    head_dim: int
    cfg_tile: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 ip_context: Optional[jax.Array] = None, ip_scale=1.0,
                 tome=None, tome_hw=None, tome_key=None,
                 tome_cache=None) -> jax.Array:
        # torch nn.LayerNorm eps (diffusers BasicTransformerBlock) = 1e-5.
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name)  # noqa: E731
        attn = lambda name: Attention(  # noqa: E731
            self.num_heads, self.head_dim, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        if tome is not None:
            from sonicdiffusionbayeslab_tpu.ops.tome import bipartite_soft_matching_2d

            # Shared matching: reuse any entry for this (H, W) whose built
            # batch divides ours (the closures tile their index maps — the
            # CFG shared-prefix first site builds at B, later sites run 2B).
            merge = unmerge = None
            if tome.share and tome_cache is not None:
                for (ch, cw, cb), mu in tome_cache.items():
                    if (ch, cw) == tome_hw and x.shape[0] % cb == 0:
                        merge, unmerge = mu
                        break
            if merge is None:
                merge, unmerge = bipartite_soft_matching_2d(
                    x, tome_hw[0], tome_hw[1], tome, tome_key
                )
                if tome.share and tome_cache is not None:
                    tome_cache[(tome_hw[0], tome_hw[1], x.shape[0])] = (
                        merge, unmerge)
            x = x + unmerge(attn("attn1")(merge(ln("norm1")(x))))
        else:
            x = x + attn("attn1")(ln("norm1")(x))
        if self.cfg_tile:
            x = jnp.concatenate([x, x], axis=0)
        x = x + attn("attn2")(ln("norm2")(x), context=context,
                              ip_context=ip_context, ip_scale=ip_scale)
        x = x + GEGLUFeedForward(
            x.shape[-1], dtype=self.dtype, param_dtype=self.param_dtype, name="ff"
        )(ln("norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    """Transformer2D over an NHWC feature map: GN -> proj_in -> blocks -> proj_out, residual.

    ``cfg_tile``: CFG shared-prefix entry point — ``x`` is the single latent
    copy [B, ...] while ``context`` is [2B, ...]; block 0 tiles to 2B right
    before its cross-attention (see TransformerBlock.cfg_tile).

    ``tome``/``tome_key``: Token Merging around each block's self-attention
    (ops/tome.py); the static map shape for the 2D partition is this
    module's own H x W."""

    num_heads: int
    head_dim: int
    depth: int = 1
    cfg_tile: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 ip_context: Optional[jax.Array] = None, ip_scale=1.0,
                 tome=None, tome_key=None, tome_cache=None) -> jax.Array:
        B, H, W, C = x.shape
        residual = x
        if tome is not None and (H % tome.sy or W % tome.sx):
            tome = None  # partition undefined for this map shape; skip site
        import os

        # SDBL_PROJ_NHWC=1 (perf experiment, exact math): apply the boundary
        # projections on the rank-4 NHWC map instead of the [B, N, C] token
        # tensor — the same dot_general, but XLA's layout assignment sees a
        # feature-minor operand shared with the neighboring convs, probing
        # whether the measured N-minor boundary relayout (five [16,4096,320]
        # fusions at ~49 TFLOP/s, docs/PERF.md round-2 profile) disappears.
        # Param tree is identical (Dense contracts the last axis at any rank).
        proj_nhwc = os.environ.get("SDBL_PROJ_NHWC", "") == "1"
        # diffusers Transformer2DModel's input GroupNorm uses eps=1e-6.
        h = GroupNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name="norm")(x)
        if proj_nhwc:
            h = projection_dense(C, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")(h)
            h = h.reshape(B, H * W, C)
        else:
            h = h.reshape(B, H * W, C)
            h = projection_dense(C, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in")(h)
        for i in range(self.depth):
            bkey = None
            if tome is not None and tome_key is not None:
                bkey = jax.random.fold_in(tome_key, i)
            h = TransformerBlock(
                self.num_heads, self.head_dim,
                cfg_tile=(self.cfg_tile and i == 0),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"block_{i}",
            )(h, context, ip_context=ip_context, ip_scale=ip_scale,
              tome=tome, tome_hw=(H, W), tome_key=bkey, tome_cache=tome_cache)
        if self.cfg_tile:
            residual = jnp.concatenate([residual, residual], axis=0)
            B = 2 * B
        if proj_nhwc:
            h = h.reshape(B, H, W, C)
            h = projection_dense(C, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out")(h)
            out = h + residual
        else:
            h = projection_dense(C, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out")(h)
            out = h.reshape(B, H, W, C) + residual
        if os.environ.get("SDBL_XFMR_BARRIER", "") == "1":
            # Perf experiment: keep the transformer's token-major layouts
            # from leaking into the neighboring convs' fusions (the profile
            # shows N-minor [B,N,C] boundary fusions at ~49 TFLOP/s vs
            # 140+ for clean convs at the 64x64 level; docs/PERF.md).
            out = jax.lax.optimization_barrier(out)
        return out


class Downsample(nn.Module):
    """Strided 3x3 conv.  ``asymmetric_pad`` reproduces the SD VAE encoder's
    convention (diffusers Downsample2D with use_conv=True, padding=0 followed
    by F.pad (0,1,0,1)): zero rows/cols added on the RIGHT/BOTTOM only.  The
    UNet's downsamplers use symmetric padding=1.

    ``allow_quant``: under the int8 conv quant modes (ops/quant.py) the 3x3
    runs W8A8.  Opt-IN (default False) — only the UNet passes True; the VAE
    and ControlNet stay exact."""

    channels: int
    asymmetric_pad: bool = False
    allow_quant: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from sonicdiffusionbayeslab_tpu.ops.quant import conv_quant_enabled

        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else 1
        conv_cls = QuantConv if (self.allow_quant and conv_quant_enabled()) else nn.Conv
        return conv_cls(
            self.channels, (3, 3), strides=(2, 2), padding=pad,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    """Nearest-2x resize + 3x3 conv.  ``allow_quant`` as in Downsample."""

    channels: int
    allow_quant: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from sonicdiffusionbayeslab_tpu.ops.quant import conv_quant_enabled

        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        conv_cls = QuantConv if (self.allow_quant and conv_quant_enabled()) else nn.Conv
        return conv_cls(
            self.channels, (3, 3), padding=1, dtype=self.dtype, param_dtype=self.param_dtype, name="conv"
        )(x)


class AttnBlock2D(nn.Module):
    """Single-head (configurable) spatial self-attention used in the VAE mid block."""

    num_heads: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        # diffusers VAE attention GroupNorm uses eps=1e-6.
        h = GroupNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=self.param_dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = Attention(
            self.num_heads, C // self.num_heads, dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn",
        )(h)
        return x + h.reshape(B, H, W, C)
