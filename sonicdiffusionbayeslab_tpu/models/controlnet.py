"""ControlNet in Flax (beyond-reference model family).

Zhang et al. 2023 ("Adding Conditional Control to Text-to-Image Diffusion
Models"), diffusers ``ControlNetModel`` geometry: a trainable copy of the
UNet *encoder* (conv_in, time embedding, down stack, mid block — module
names here intentionally match ``models/unet.py`` so the weight converter
shares the same name map), plus

- a conditioning embedding that downsamples the [0,1] control image
  (canny/depth/pose map, pixel resolution) to latent resolution through a
  SiLU conv stack and ADDS it to conv_in's output, and
- one zero-initialized 1x1 conv per skip state ("zero convs") + one for the
  mid block, whose outputs are the residuals the UNet injects
  (``UNet2DCondition(control_residuals=...)``).

Zero init makes an untrained ControlNet an exact no-op — tested against the
bare UNet output (tests/test_controlnet.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.models.layers import (
    Downsample,
    ResnetBlock,
    SpatialTransformer,
    TimestepEmbedMLP,
    timestep_embedding,
)
from sonicdiffusionbayeslab_tpu.models.unet import UNetConfig

# diffusers ControlNetConditioningEmbedding block_out_channels default.
COND_EMBED_CHANNELS = (16, 32, 96, 256)


class ConditioningEmbedding(nn.Module):
    """Control image [B, 8h, 8w, 3] -> latent-resolution feature [B, h, w, C0].

    conv_in -> SiLU -> (conv s1 -> SiLU -> conv s2 -> SiLU) x3 -> zero conv_out.
    """

    out_channels: int
    channels: Tuple[int, ...] = COND_EMBED_CHANNELS
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jax.Array) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Conv(self.channels[0], (3, 3), padding=1, name="conv_in", **kw)(
            cond.astype(self.dtype)
        )
        h = nn.silu(h)
        for i in range(len(self.channels) - 1):
            h = nn.silu(
                nn.Conv(self.channels[i], (3, 3), padding=1, name=f"blocks_{2 * i}", **kw)(h)
            )
            h = nn.silu(
                nn.Conv(
                    self.channels[i + 1], (3, 3), strides=(2, 2), padding=1,
                    name=f"blocks_{2 * i + 1}", **kw,
                )(h)
            )
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, name="conv_out",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros, **kw,
        )(h)


class ControlNet(nn.Module):
    """UNet-encoder copy + conditioning embedding + zero-conv heads.

    Returns ``(down_residuals, mid_residual)``, each scaled by
    ``conditioning_scale``, ready for
    ``UNet2DCondition.__call__(control_residuals=...)``.
    """

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # [B, h, w, C_in] latents
        timesteps: jax.Array,  # [B] or scalar
        encoder_hidden_states: jax.Array,  # [B, T, cross_attention_dim]
        cond: jax.Array,  # [B, 8h, 8w, 3] control image in [0, 1]
        conditioning_scale: float | jax.Array = 1.0,
        added_cond: Optional[dict] = None,  # SDXL text_time (unused for SD-1.5)
    ):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        t_emb = TimestepEmbedMLP(cfg.block_out_channels[0] * 4, name="time_embedding", **kw)(
            t_emb.astype(self.dtype)
        )
        if cfg.addition_time_embed_dim is not None:
            # SDXL text_time micro-conditioning — same structure (and hence
            # converter map entries) as models/unet.py's add_embedding.
            if added_cond is None:
                raise ValueError(
                    "this ControlNet config requires added_cond={'text_embeds', 'time_ids'}"
                )
            ids = added_cond["time_ids"].astype(jnp.float32)
            B, K = ids.shape
            id_emb = timestep_embedding(ids.reshape(-1), cfg.addition_time_embed_dim)
            id_emb = id_emb.reshape(B, K * cfg.addition_time_embed_dim)
            add_in = jnp.concatenate(
                [added_cond["text_embeds"].astype(jnp.float32), id_emb], axis=-1
            )
            t_emb = t_emb + TimestepEmbedMLP(
                cfg.block_out_channels[0] * 4, name="add_embedding", **kw
            )(add_in.astype(self.dtype))
        ctx = encoder_hidden_states.astype(self.dtype)

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **kw)(
            sample.astype(self.dtype)
        )
        h = h + ConditioningEmbedding(
            cfg.block_out_channels[0], name="cond_embedding", **kw
        )(cond)

        def res(ch, name):
            return ResnetBlock(ch, name=name, **kw)

        def xfmr(ch, name, lvl):
            heads = cfg.heads_at(lvl)
            return SpatialTransformer(
                heads, ch // heads, depth=cfg.depth_at(lvl), name=name, **kw
            )

        n_levels = len(cfg.block_out_channels)
        skips = [h]
        for lvl, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = res(ch, f"down_{lvl}_res_{j}")(h, t_emb)
                if cfg.cross_attention[lvl]:
                    h = xfmr(ch, f"down_{lvl}_attn_{j}", lvl)(h, ctx)
                skips.append(h)
            if lvl < n_levels - 1:
                h = Downsample(ch, name=f"down_{lvl}_downsample", **kw)(h)
                skips.append(h)

        mid_ch = cfg.block_out_channels[-1]
        h = res(mid_ch, "mid_res_0")(h, t_emb)
        h = xfmr(mid_ch, "mid_attn", n_levels - 1)(h, ctx)
        h = res(mid_ch, "mid_res_1")(h, t_emb)

        def zero_conv(ch, name):
            return nn.Conv(
                ch, (1, 1), name=name,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros, **kw,
            )

        scale = jnp.asarray(conditioning_scale, self.dtype)
        down_res = tuple(
            zero_conv(s.shape[-1], f"control_out_{i}")(s) * scale
            for i, s in enumerate(skips)
        )
        mid_res = zero_conv(mid_ch, "control_mid")(h) * scale
        return down_res, mid_res
