"""AutoencoderKL (SD VAE) in Flax, NHWC.

TPU-native replacement for the diffusers VAE the reference calls for final
and per-x0 latent decodes (src/models.py:287-302).  Decoder is the hot
path (every generated image + every captured x0 grid frame); the encoder is
included for dataset round-trips (FID real-image features, future img2img).

Geometry (SD-1.5 vae/config.json): latent 4ch, block_out_channels
(128, 256, 512, 512), 2 layers/block, mid attention, scaling_factor 0.18215.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.models.layers import (
    AttnBlock2D,
    Downsample,
    GroupNorm,
    ResnetBlock,
    Upsample,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    # SD3-family KL-VAE: latents are (z - shift) * scale at encode and
    # z / scale + shift at decode (diffusers AutoencoderKL.config.shift_factor).
    shift_factor: float = 0.0
    # SD3 drops the 1x1 (post_)quant convs (use_quant_conv=False).
    use_quant_conv: bool = True

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(16, 32), layers_per_block=1)

    @classmethod
    def tiny16(cls) -> "VAEConfig":
        """Tiny geometry with the SD3 16-channel latent contract."""
        return cls(block_out_channels=(16, 32), layers_per_block=1,
                   latent_channels=16, scaling_factor=1.5305,
                   shift_factor=0.0609, use_quant_conv=False)

    @classmethod
    def sd15(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def sdxl(cls) -> "VAEConfig":
        """Same geometry as SD's KL-VAE; SDXL retrained it (scaling factor
        0.13025, stable-diffusion-xl-base-1.0 vae/config.json)."""
        return cls(scaling_factor=0.13025)

    @classmethod
    def sd3(cls) -> "VAEConfig":
        """stable-diffusion-3-medium vae/config.json: 16-channel latents,
        scaling 1.5305, shift 0.0609, no (post_)quant convs."""
        return cls(latent_channels=16, scaling_factor=1.5305,
                   shift_factor=0.0609, use_quant_conv=False)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rkw = dict(norm_epsilon=1e-6, allow_quant=False, **kw)  # AutoencoderKL eps; decode stays exact under int8_conv
        ch_top = cfg.block_out_channels[-1]
        h = nn.Conv(ch_top, (3, 3), padding=1, name="conv_in", **kw)(z.astype(self.dtype))
        h = ResnetBlock(ch_top, name="mid_res_0", **rkw)(h)
        h = AttnBlock2D(name="mid_attn", **kw)(h)
        h = ResnetBlock(ch_top, name="mid_res_1", **rkw)(h)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(ch, name=f"up_{i}_res_{j}", **rkw)(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Upsample(ch, name=f"up_{i}_upsample", **kw)(h)
        h = GroupNorm(silu=True, epsilon=1e-6, name="norm_out", **kw)(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, name="conv_out", **kw)(h).astype(
            jnp.float32
        )


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rkw = dict(norm_epsilon=1e-6, allow_quant=False, **kw)  # AutoencoderKL eps; decode stays exact under int8_conv
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **kw)(
            x.astype(self.dtype)
        )
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, name=f"down_{i}_res_{j}", **rkw)(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(ch, asymmetric_pad=True,
                               name=f"down_{i}_downsample", **kw)(h)
        ch_top = cfg.block_out_channels[-1]
        h = ResnetBlock(ch_top, name="mid_res_0", **rkw)(h)
        h = AttnBlock2D(name="mid_attn", **kw)(h)
        h = ResnetBlock(ch_top, name="mid_res_1", **rkw)(h)
        h = GroupNorm(silu=True, epsilon=1e-6, name="norm_out", **kw)(h)
        # moments: mean + logvar
        return nn.Conv(cfg.latent_channels * 2, (3, 3), padding=1, name="conv_out", **kw)(h).astype(
            jnp.float32
        )


class AutoencoderKL(nn.Module):
    """decode(z) -> image in [-1, 1]; encode(x) -> (mean, logvar)."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.decoder = Decoder(self.config, self.dtype, self.param_dtype)
        self.encoder = Encoder(self.config, self.dtype, self.param_dtype)
        if self.config.use_quant_conv:
            kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
            self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), **kw)
            self.quant_conv = nn.Conv(self.config.latent_channels * 2, (1, 1), **kw)

    def decode(self, z: jax.Array) -> jax.Array:
        """z: scaled latents [B, h, w, C] -> image [B, 8h, 8w, 3] in [-1, 1]."""
        z = z / self.config.scaling_factor + self.config.shift_factor
        z = z.astype(self.dtype)
        if self.config.use_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def encode(self, x: jax.Array):
        h = self.encoder(x).astype(self.dtype)
        if self.config.use_quant_conv:
            h = self.quant_conv(h)
        moments = h.astype(jnp.float32)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_sample(self, x: jax.Array, rng: jax.Array) -> jax.Array:
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return (z - self.config.shift_factor) * self.config.scaling_factor

    def __call__(self, z: jax.Array) -> jax.Array:  # default path = decode
        return self.decode(z)

    def init_all(self, z: jax.Array):
        """Trace decode + encode so init creates every param."""
        img = self.decode(z)
        return self.encode(img)
