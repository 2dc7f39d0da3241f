"""T5 v1.1 encoder in Flax — SD3's third text tower (text_encoder_3).

Beyond-reference model support (the reference lab drives SD-1.5's single
CLIP tower only, /root/reference/src/models.py:139-155): SD3 conditions on
CLIP-L ++ CLIP-bigG features concatenated on the SEQUENCE axis with the
T5-XXL encoder's hidden states (diffusers StableDiffusion3Pipeline
``encode_prompt``).  ``SD3Engine`` runs the CLIP-only drop-T5 mode by
default (the paper's ablated configuration); this module enables the full
triple-tower mode when a checkpoint is available.

Architecture (HF ``T5EncoderModel``, google/t5-v1_1-xxl — the public
reference implementation; parity-gated in tests/test_hf_forward_parity.py):

 - RMSNorm pre-norm (T5LayerNorm: no mean subtraction, no bias, fp32
   moments), residual blocks of [self-attention, gated-GELU FF];
 - attention has NO 1/sqrt(d) scaling (folded into init by T5's recipe)
   and NO absolute position embeddings — a learned RELATIVE position bias
   (bucketed log-distance, 32 buckets / max distance 128) computed in the
   first block and shared by every layer;
 - FF is v1.1 gated: ``wo(gelu_tanh(wi_0 x) * wi_1 x)``, all Linears
   bias-free;
 - like diffusers' SD3 text path, no attention mask — the fixed-length
   padded sequence attends everywhere, which also keeps the whole forward
   one static-shape fusion for XLA.

TPU notes: the relative-bucket table depends only on the (static) sequence
length, so it is computed in numpy at trace time and baked into the
compiled program as a constant gather — no dynamic control flow.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    max_length: int = 256  # SD3's max_sequence_length for the T5 tokens

    @classmethod
    def xxl(cls) -> "T5Config":
        """google/t5-v1_1-xxl encoder (SD3's text_encoder_3 config.json)."""
        return cls()

    @classmethod
    def tiny(cls) -> "T5Config":
        """CPU-testable geometry, same code path.  d_model=40 matches
        MMDiTConfig.tiny().joint_attention_dim so the tiny triple-tower
        pipeline needs no extra projection."""
        return cls(vocab_size=1000, d_model=40, d_kv=8, d_ff=64, num_layers=2,
                   num_heads=2, relative_attention_num_buckets=8,
                   relative_attention_max_distance=16, max_length=16)


def relative_position_buckets(
    q_len: int,
    k_len: int,
    *,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> np.ndarray:
    """[q_len, k_len] int32 bucket ids — HF ``_relative_position_bucket``
    (bidirectional=True): half the buckets for each sign, half of those
    exact small distances, the rest log-spaced up to ``max_distance``."""
    ctx = np.arange(q_len, dtype=np.int64)[:, None]
    mem = np.arange(k_len, dtype=np.int64)[None, :]
    rel = mem - ctx  # relative_position = memory - query

    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    out += np.where(n < max_exact, n, large)
    return out.astype(np.int32)


class T5Attention(nn.Module):
    """Unscaled multi-head self-attention + additive position bias.

    Inline einsum rather than ops/attention.py: T5 scores are UNSCALED and
    carry a per-head additive bias, and the tower runs once per prompt (not
    in the denoise hot loop) — XLA's plain fusion is the right backend."""

    config: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, position_bias: jax.Array) -> jax.Array:
        cfg = self.config
        B, T, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda n, d: nn.Dense(  # noqa: E731
            d, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype, name=n)
        q = dense("q", inner)(x).reshape(B, T, cfg.num_heads, cfg.d_kv)
        k = dense("k", inner)(x).reshape(B, T, cfg.num_heads, cfg.d_kv)
        v = dense("v", inner)(x).reshape(B, T, cfg.num_heads, cfg.d_kv)
        # No 1/sqrt(d_kv): T5 folds the scale into initialization.
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        probs = jax.nn.softmax(scores + position_bias, axis=-1).astype(self.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, inner)
        return dense("o", cfg.d_model)(o)


class T5Block(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, position_bias: jax.Array) -> jax.Array:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        rms = lambda n: nn.RMSNorm(  # noqa: E731
            epsilon=cfg.layer_norm_epsilon, name=n, **kw)
        x = x + T5Attention(cfg, name="attn", **kw)(rms("ln1")(x), position_bias)
        h = rms("ln2")(x)
        dense = lambda n, d: nn.Dense(  # noqa: E731
            d, use_bias=False, name=n, **kw)
        # v1.1 gated-GELU FF (gelu_new = tanh approximation).
        h = nn.gelu(dense("wi_0", cfg.d_ff)(h), approximate=True) * dense("wi_1", cfg.d_ff)(h)
        return x + dense("wo", cfg.d_model)(h)


class T5Encoder(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        """input_ids [B, T] -> {"last_hidden_state": [B, T, d_model] fp32}."""
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        T = input_ids.shape[1]

        x = nn.Embed(cfg.vocab_size, cfg.d_model, param_dtype=self.param_dtype,
                     name="token_embedding")(input_ids).astype(self.dtype)

        # Relative bias: bucket table is static (numpy, baked at trace time);
        # the learned [num_buckets, num_heads] embedding lives in block 0's
        # attention in HF — kept top-level here, shared by every layer, and
        # mapped from block 0 by the converter.
        buckets = relative_position_buckets(
            T, T, num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance)
        table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            self.param_dtype,
        )
        # [T, T] buckets -> [1, H, T, T] additive bias, fp32 like the scores.
        bias = jnp.transpose(
            jnp.asarray(table, jnp.float32)[jnp.asarray(buckets)], (2, 0, 1)
        )[None]

        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"block_{i}", **kw)(x, bias)
        x = nn.RMSNorm(epsilon=cfg.layer_norm_epsilon, name="final_ln", **kw)(x)
        return {"last_hidden_state": x.astype(jnp.float32)}
