"""CLIP vision tower (ViT) + full CLIP dual-encoder for on-device metrics.

TPU-native replacement for the torchmetrics CLIPScore stack the reference
uses (openai/clip-vit-base-patch16 via HF, src/metrics/metrics.py:25-41 and
calc_clip_score.py:13-37): image embeddings come from a Flax ViT, text
embeddings reuse :mod:`clip_text`'s tower, both projected to the shared
space; score = max(0, 100 * cosine).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.models.clip_text import CLIPLayer, CLIPTextConfig, CLIPTextModel


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """Defaults = openai/clip-vit-base-patch16 vision tower."""

    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(image_size=32, patch_size=8, hidden_size=32, num_layers=2,
                   num_heads=2, intermediate_size=64)

    @classmethod
    def vit_l14(cls) -> "CLIPVisionConfig":
        """openai/clip-vit-large-patch14 vision tower (the embedding space
        the LAION aesthetic predictor was trained on; projection 768)."""
        return cls(image_size=224, patch_size=14, hidden_size=1024,
                   num_layers=24, num_heads=16, intermediate_size=4096)


# openai/clip-vit-base-patch16 text tower differs from SD's ViT-L text tower.
CLIP_B16_TEXT = CLIPTextConfig(hidden_size=512, num_layers=12, num_heads=8,
                               intermediate_size=2048)

_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionModel(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array):
        """pixels [B, H, W, 3] already CLIP-normalized -> (pooled, tokens)."""
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        B = pixels.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            name="patch_embedding",
            **kw,
        )(pixels.astype(self.dtype))
        x = x.reshape(B, -1, cfg.hidden_size)
        cls_tok = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,), self.param_dtype
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (B, 1, cfg.hidden_size)).astype(x.dtype), x], 1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (n_pos, cfg.hidden_size), self.param_dtype
        )
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="pre_ln", **kw)(x)
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg.num_heads, cfg.intermediate_size, name=f"layer_{i}", **kw)(x, None)
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_ln", **kw)(x[:, 0])
        return pooled.astype(jnp.float32), x.astype(jnp.float32)


class CLIPDualEncoder(nn.Module):
    """Full CLIP: vision + text towers + projections to the shared space."""

    vision_config: CLIPVisionConfig
    text_config: CLIPTextConfig
    projection_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision = CLIPVisionModel(self.vision_config, self.dtype, self.param_dtype)
        self.text = CLIPTextModel(self.text_config, self.dtype, self.param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_bias=False)
        self.visual_projection = nn.Dense(self.projection_dim, name="visual_projection", **kw)
        self.text_projection = nn.Dense(self.projection_dim, name="text_projection", **kw)

    def embed_image(self, pixels: jax.Array) -> jax.Array:
        """pixels [B, H, W, 3] in [0, 1] -> L2-normalized [B, P]."""
        x = (pixels - _MEAN) / _STD
        if x.shape[1] != self.vision_config.image_size:
            x = jax.image.resize(
                x,
                (x.shape[0], self.vision_config.image_size, self.vision_config.image_size, 3),
                method="bilinear",
            )
        pooled, _ = self.vision(x)
        emb = self.visual_projection(pooled.astype(self.dtype)).astype(jnp.float32)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-8)

    def embed_text(self, input_ids: jax.Array) -> jax.Array:
        pooled = self.text(input_ids)["pooled_output"]
        emb = self.text_projection(pooled.astype(self.dtype)).astype(jnp.float32)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-8)

    def __call__(self, pixels: jax.Array, input_ids: jax.Array):
        """CLIP score per pair: max(0, 100 * cos) — torchmetrics CLIPScore
        semantics (reference metrics.py:25-41)."""
        vi = self.embed_image(pixels)
        vt = self.embed_text(input_ids)
        return jnp.maximum(100.0 * jnp.sum(vi * vt, axis=-1), 0.0)
