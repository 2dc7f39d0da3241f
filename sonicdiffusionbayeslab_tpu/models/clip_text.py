"""CLIP text encoder in Flax (ViT-L/14 text tower, SD-1.5's conditioner).

TPU-native replacement for the transformers ``CLIPTextModel`` the reference
uses via ``encode_prompt`` (src/models.py:139-155).  Pre-LN transformer with
causal masking and quick-GELU, final LayerNorm; SD conditions on the last
hidden state [B, 77, 768].

Also doubles as the text tower for the on-device CLIP-score metric; the
matching vision tower lives in ``clip_vision.py``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    intermediate_size: int = 3072
    hidden_act: str = "quick_gelu"  # OpenCLIP towers (SDXL bigG) use "gelu"

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)

    @classmethod
    def sd15(cls) -> "CLIPTextConfig":
        return cls()

    @classmethod
    def sd21(cls) -> "CLIPTextConfig":
        """SD-2.1 text tower: OpenCLIP ViT-H trimmed to 23 layers
        (stable-diffusion-2-1 text_encoder/config.json) — the 'penultimate
        layer' convention is baked into the shipped checkpoint, so the
        final hidden state is what conditions the UNet."""
        return cls(hidden_size=1024, num_layers=23, num_heads=16,
                   intermediate_size=4096, hidden_act="gelu")

    @classmethod
    def tiny21(cls) -> "CLIPTextConfig":
        return cls(vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
                   intermediate_size=64, hidden_act="gelu")

    @classmethod
    def sdxl_g(cls) -> "CLIPTextConfig":
        """SDXL's second tower: OpenCLIP ViT-bigG text model
        (stable-diffusion-xl-base-1.0 text_encoder_2/config.json)."""
        return cls(hidden_size=1280, num_layers=32, num_heads=20,
                   intermediate_size=5120, hidden_act="gelu")

    @classmethod
    def tiny_g(cls) -> "CLIPTextConfig":
        return cls(vocab_size=1000, hidden_size=16, num_layers=2, num_heads=2,
                   intermediate_size=32, hidden_act="gelu")


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        B, T, C = x.shape
        D = C // self.num_heads
        dense = lambda name: nn.Dense(C, dtype=self.dtype, param_dtype=self.param_dtype, name=name)  # noqa: E731
        q = dense("q_proj")(x).reshape(B, T, self.num_heads, D)
        k = dense("k_proj")(x).reshape(B, T, self.num_heads, D)
        v = dense("v_proj")(x).reshape(B, T, self.num_heads, D)
        o = dot_product_attention(q, k, v, mask=mask)
        return dense("out_proj")(o.reshape(B, T, C))


class CLIPLayer(nn.Module):
    num_heads: int
    intermediate_size: int
    hidden_act: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # HF CLIP LayerNorm eps = 1e-5.
        h = nn.LayerNorm(epsilon=1e-5, name="ln1", **kw)(x)
        x = x + CLIPAttention(self.num_heads, name="attn", **kw)(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="ln2", **kw)(x)
        h = nn.Dense(self.intermediate_size, name="fc1", **kw)(h)
        h = quick_gelu(h) if self.hidden_act == "quick_gelu" else nn.gelu(h, approximate=False)
        x = x + nn.Dense(x.shape[-1], name="fc2", **kw)(h)
        return x


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        """input_ids [B, T] -> dict(last_hidden_state [B, T, C], pooled [B, C])."""
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        B, T = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=self.param_dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
            self.param_dtype,
        )
        x = (tok + pos[None, :T]).astype(self.dtype)

        causal = jnp.tril(jnp.ones((T, T), bool))[None, None]  # [1, 1, T, T]
        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                # hidden_states[-2] in HF terms: the last layer's INPUT,
                # un-normed — what SDXL conditions on (clip-skip style).
                penultimate = x.astype(jnp.float32)
            x = CLIPLayer(cfg.num_heads, cfg.intermediate_size, cfg.hidden_act,
                          name=f"layer_{i}", **kw)(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="final_ln", **kw)(x)
        x = x.astype(jnp.float32)

        # Pooled output = hidden state at each sequence's EOT token (highest
        # token id in CLIP's vocab ordering — argmax convention).
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(B), eot]
        return {
            "last_hidden_state": x,
            "pooled_output": pooled,
            "penultimate_hidden_state": penultimate,
        }
