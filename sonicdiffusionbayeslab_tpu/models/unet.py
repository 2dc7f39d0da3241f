"""UNet2DCondition in Flax (SD-1.5 geometry), NHWC / bf16-ready.

TPU-native replacement for the diffusers ``UNet2DConditionModel`` the
reference drives from its denoising loops (src/models.py:227-235) — same
architecture family (Rombach et al. LDM UNet: resnet blocks + spatial
transformers with cross-attention to CLIP text states), re-written for XLA:
static shapes, NHWC, fp32 norm statistics, attention routed through the
swappable ops backend.

The per-block *deep-feature cache* hooks (``cache`` / ``return_cached``
arguments of ``__call__``) are the static-structure re-expression of
DeepCache (reference: DeepCacheSDHelper forward-hook monkey-patching,
src/experiments/deep_cache.py:23-29): the caller compiles two variants of
the same module — one that returns the deep trunk's features, one that
consumes them and only runs the shallowest branch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.models.layers import (
    Downsample,
    GroupNorm,
    ResnetBlock,
    SpatialTransformer,
    TimestepEmbedMLP,
    Upsample,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD-1.5 defaults (runwayml/stable-diffusion-v1-5 unet/config.json)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention: Tuple[bool, ...] = (True, True, True, False)
    transformer_depth: int = 1
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    freq_shift: float = 0.0  # unused placeholder for parity with HF config

    @classmethod
    def tiny(cls) -> "UNetConfig":
        """2-level random-weight UNet for CPU tests (SURVEY §4 integration)."""
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention=(True, False),
            num_attention_heads=2,
            cross_attention_dim=32,
        )

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls()


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # [B, H, W, C_in]
        timesteps: jax.Array,  # [B] or scalar
        encoder_hidden_states: jax.Array,  # [B, T, cross_attention_dim]
        cache: Optional[jax.Array] = None,  # deep-feature injection (DeepCache)
        return_cache: bool = False,  # also return the deep trunk's features
    ):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        t_emb = TimestepEmbedMLP(cfg.block_out_channels[0] * 4, name="time_embedding", **kw)(
            t_emb.astype(self.dtype)
        )
        ctx = encoder_hidden_states.astype(self.dtype)

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **kw)(
            sample.astype(self.dtype)
        )

        def res(ch, name):
            return ResnetBlock(ch, name=name, **kw)

        def xfmr(ch, name):
            return SpatialTransformer(
                cfg.num_attention_heads,
                ch // cfg.num_attention_heads,
                depth=cfg.transformer_depth,
                name=name,
                **kw,
            )

        n_levels = len(cfg.block_out_channels)
        # DeepCache split (cache_branch_id=0 semantics, reference
        # deep_cache.py:25-27): the shallow branch = down level 0 + up level 0;
        # everything deeper (down levels 1+, mid, up levels 1+) is the trunk
        # whose output feature map is cached/replayed between steps.  On a
        # cached step only the shallow branch executes.
        deep = cache is None

        # ---- down stack; skips collected for the up stack ------------------
        skips = [h]
        for lvl, ch in enumerate(cfg.block_out_channels):
            if lvl > 0 and not deep:
                break
            for j in range(cfg.layers_per_block):
                h = res(ch, f"down_{lvl}_res_{j}")(h, t_emb)
                if cfg.cross_attention[lvl]:
                    h = xfmr(ch, f"down_{lvl}_attn_{j}")(h, ctx)
                skips.append(h)
            if lvl < n_levels - 1 and deep:
                h = Downsample(ch, name=f"down_{lvl}_downsample", **kw)(h)
                skips.append(h)

        if deep:
            # ---- mid -----------------------------------------------------
            mid_ch = cfg.block_out_channels[-1]
            h = res(mid_ch, "mid_res_0")(h, t_emb)
            h = xfmr(mid_ch, "mid_attn")(h, ctx)
            h = res(mid_ch, "mid_res_1")(h, t_emb)

            # ---- up stack through the deep levels ------------------------
            for lvl in reversed(range(1, n_levels)):
                ch = cfg.block_out_channels[lvl]
                for j in range(cfg.layers_per_block + 1):
                    skip = skips.pop()
                    h = res(ch, f"up_{lvl}_res_{j}")(jnp.concatenate([h, skip], axis=-1), t_emb)
                    if cfg.cross_attention[lvl]:
                        h = xfmr(ch, f"up_{lvl}_attn_{j}")(h, ctx)
                h = Upsample(ch, name=f"up_{lvl}_upsample", **kw)(h)
            deep_features = h
        else:
            deep_features = cache.astype(self.dtype)
            h = deep_features

        # ---- shallowest up level (always executed) --------------------------
        ch = cfg.block_out_channels[0]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            h = res(ch, f"up_0_res_{j}")(jnp.concatenate([h, skip], axis=-1), t_emb)
            if cfg.cross_attention[0]:
                h = xfmr(ch, f"up_0_attn_{j}")(h, ctx)

        h = GroupNorm(silu=True, name="conv_norm_out", **kw)(h)
        out = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **kw)(h)
        out = out.astype(jnp.float32)
        if return_cache:
            return out, deep_features
        return out

    def cache_shape(self, height: int, width: int):
        """Shape of the deep-feature cache for a [*, height, width, *] sample."""
        return (height, width, self.config.block_out_channels[min(1, len(self.config.block_out_channels) - 1)])
