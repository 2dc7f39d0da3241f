"""ImageReward-v1.0 model (BLIP ViT-L + BERT cross-attention encoder + MLP
head) in Flax.

The reference scores (prompt, image) pairs with the ImageReward pip package
(metrics.py:62-95) — BLIP_Pretrain(vit='large') whose text encoder
cross-attends to vision tokens, pooled [CLS] fed to a 768->1024->128->64->16->1
MLP, z-normalized with the published constants.  This is that architecture
in Flax/NHWC with an offline weight map for the ImageReward checkpoint
(``ImageReward.pt``); without a checkpoint the RewardModel metric keeps its
CLIP-similarity fallback (metrics/metrics.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.ops.attention import dot_product_attention

# Published normalization constants of ImageReward-v1.0.
REWARD_MEAN = 0.16717362830052426
REWARD_STD = 1.0333394966054072

_IMAGENET_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_IMAGENET_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class BLIPConfig:
    # ViT-L/16 vision tower
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    # BERT-base text encoder with cross-attention
    vocab_size: int = 30524  # bert-base + BLIP's [DEC]/[ENC] tokens
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_intermediate: int = 3072
    max_text_len: int = 35  # ImageReward truncation length

    @classmethod
    def tiny(cls) -> "BLIPConfig":
        return cls(image_size=32, patch_size=8, vision_width=32, vision_layers=2,
                   vision_heads=2, vocab_size=1000, text_width=32, text_layers=2,
                   text_heads=2, text_intermediate=64)


class ViTBlock(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        h = nn.LayerNorm(epsilon=1e-6, name="ln1")(x)
        qkv = nn.Dense(C * 3, name="qkv")(h).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        o = dot_product_attention(q, k, v).reshape(B, N, C)
        x = x + nn.Dense(C, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, name="ln2")(x)
        h = nn.Dense(C * 4, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(C, name="fc2")(h)
        return x


class BLIPVisionModel(nn.Module):
    cfg: BLIPConfig

    @nn.compact
    def __call__(self, pixels):
        """pixels [B, H, W, 3] normalized -> vision tokens [B, 1+N, W]."""
        c = self.cfg
        B = pixels.shape[0]
        x = nn.Conv(c.vision_width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), name="patch_embed")(pixels)
        x = x.reshape(B, -1, c.vision_width)
        cls_tok = self.param("cls_token", nn.initializers.zeros, (1, 1, c.vision_width))
        x = jnp.concatenate([jnp.broadcast_to(cls_tok, (B, 1, c.vision_width)), x], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, (c.image_size // c.patch_size) ** 2 + 1, c.vision_width))
        x = x + pos[:, : x.shape[1]]
        for i in range(c.vision_layers):
            x = ViTBlock(c.vision_heads, name=f"block_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, name="ln_final")(x)


class BertSelfAttention(nn.Module):
    heads: int

    @nn.compact
    def __call__(self, x, kv, mask=None):
        B, N, C = x.shape
        M = kv.shape[1]
        D = C // self.heads
        q = nn.Dense(C, name="query")(x).reshape(B, N, self.heads, D)
        k = nn.Dense(C, name="key")(kv).reshape(B, M, self.heads, D)
        v = nn.Dense(C, name="value")(kv).reshape(B, M, self.heads, D)
        o = dot_product_attention(q, k, v, mask=mask).reshape(B, N, C)
        return nn.Dense(C, name="out")(o)


class BertLayer(nn.Module):
    """Post-LN BERT layer with optional cross-attention (BLIP text encoder)."""

    heads: int
    intermediate: int

    @nn.compact
    def __call__(self, x, vision, mask=None):
        a = BertSelfAttention(self.heads, name="self_attn")(x, x, mask)
        x = nn.LayerNorm(epsilon=1e-12, name="ln_self")(x + a)
        if vision is not None:
            a = BertSelfAttention(self.heads, name="cross_attn")(x, vision)
            x = nn.LayerNorm(epsilon=1e-12, name="ln_cross")(x + a)
        h = nn.Dense(self.intermediate, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        x = nn.LayerNorm(epsilon=1e-12, name="ln_out")(x + nn.Dense(x.shape[-1], name="fc2")(h))
        return x


class BLIPTextEncoder(nn.Module):
    cfg: BLIPConfig

    @nn.compact
    def __call__(self, input_ids, vision, attn_mask=None):
        c = self.cfg
        B, T = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.text_width, name="word_embeddings")(input_ids)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (512, c.text_width))
        x = nn.LayerNorm(epsilon=1e-12, name="ln_embed")(tok + pos[None, :T])
        mask = None
        if attn_mask is not None:
            mask = attn_mask[:, None, None, :].astype(bool)  # [B,1,1,T]
        for i in range(c.text_layers):
            x = BertLayer(c.text_heads, c.text_intermediate, name=f"layer_{i}")(x, vision, mask)
        return x


class RewardHead(nn.Module):
    """ImageReward's MLP head. NB: the published ImageReward-v1.0 MLP has NO
    activations — its ReLUs are commented out in the ImageReward source
    (``MLP.layers``: Linear/Dropout stacks only) — so weight parity requires
    a pure linear stack here too."""

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate((1024, 128, 64, 16)):
            x = nn.Dense(d, name=f"fc{i}")(x)
        return nn.Dense(1, name="out")(x)


class ImageRewardModel(nn.Module):
    cfg: BLIPConfig

    def setup(self):
        self.vision = BLIPVisionModel(self.cfg)
        self.text = BLIPTextEncoder(self.cfg)
        self.head = RewardHead()

    def __call__(self, pixels, input_ids, attn_mask=None):
        """Raw (un-normalized) reward per (image, prompt) pair, [B]."""
        vis = self.vision(pixels)
        txt = self.text(input_ids, vis, attn_mask)
        return self.head(txt[:, 0])[:, 0]


class ImageRewardScorer:
    """images [B,H,W,3] in [0,1] + prompts -> z-normalized reward scores.

    Drop-in ``scorer`` for the RewardModel metric; random-init unless given
    the ImageReward checkpoint (offline environment has no hub).
    """

    def __init__(self, checkpoint: Optional[str] = None, tiny: bool = False,
                 vocab_path: Optional[str] = None):
        self.cfg = BLIPConfig.tiny() if tiny else BLIPConfig()
        self.model = ImageRewardModel(self.cfg)
        px = jnp.zeros((1, self.cfg.image_size, self.cfg.image_size, 3))
        ids = jnp.zeros((1, self.cfg.max_text_len), jnp.int32)
        self.params = self.model.init(jax.random.PRNGKey(0), px, ids)["params"]
        if checkpoint:
            self.params = load_image_reward_weights(checkpoint, self.params, self.cfg)
        self.tokenizer = _BertTokenizer(vocab_path, self.cfg.vocab_size, self.cfg.max_text_len)

        @jax.jit
        def fn(p, pixels, ids, mask):
            x = (pixels - _IMAGENET_MEAN) / _IMAGENET_STD
            x = jax.image.resize(x, (x.shape[0], self.cfg.image_size, self.cfg.image_size, 3),
                                 "bilinear")
            return self.model.apply({"params": p}, x, ids, mask)

        self._fn = fn

    def __call__(self, images: np.ndarray, prompts) -> np.ndarray:
        ids, mask = self.tokenizer(list(prompts))
        raw = np.asarray(self._fn(self.params, jnp.asarray(images, jnp.float32),
                                  jnp.asarray(ids), jnp.asarray(mask)))
        return (raw - REWARD_MEAN) / REWARD_STD


class _BertTokenizer:
    """WordPiece when a bert vocab.txt is available; hash fallback otherwise."""

    def __init__(self, vocab_path: Optional[str], vocab_size: int, max_len: int):
        self.max_len = max_len
        self.vocab = None
        if vocab_path:
            from pathlib import Path

            p = Path(vocab_path)
            if p.exists():
                self.vocab = {w: i for i, w in enumerate(p.read_text().splitlines())}
        self.vocab_size = vocab_size
        self.cls, self.sep, self.pad, self.unk = 101, 102, 0, 100

    def _wordpiece(self, word: str):
        if word in self.vocab:
            return [self.vocab[word]]
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            cur = None
            while end > start:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.vocab.get("[UNK]", self.unk)]
            pieces.append(cur)
            start = end
        return pieces

    def __call__(self, texts):
        import re

        B = len(texts)
        ids = np.zeros((B, self.max_len), np.int32)
        mask = np.zeros((B, self.max_len), np.int32)
        for b, t in enumerate(texts):
            words = re.findall(r"\w+|[^\w\s]", t.lower())
            toks = []
            for w in words:
                if self.vocab is not None:
                    toks.extend(self._wordpiece(w))
                else:
                    h = 2166136261
                    for ch in w.encode():
                        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
                    toks.append(103 + h % (self.vocab_size - 200))
            toks = [self.cls] + toks[: self.max_len - 2] + [self.sep]
            ids[b, : len(toks)] = toks
            mask[b, : len(toks)] = 1
        return ids, mask


def load_image_reward_weights(path: str, ref_params: dict, cfg: BLIPConfig) -> dict:
    """Map the ImageReward-v1.0 torch checkpoint onto this tree.

    Key families: ``blip.visual_encoder.*`` (timm ViT naming),
    ``blip.text_encoder.bert.*`` (HF BERT naming), ``mlp.layers.*``.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    g = lambda k: sd[k].float().numpy()  # noqa: E731
    t = lambda k: np.transpose(g(k))  # noqa: E731
    out = jax.tree.map(np.asarray, ref_params)

    v = out["vision"]
    v["patch_embed"]["kernel"] = np.transpose(g("blip.visual_encoder.patch_embed.proj.weight"), (2, 3, 1, 0))
    v["patch_embed"]["bias"] = g("blip.visual_encoder.patch_embed.proj.bias")
    v["cls_token"] = g("blip.visual_encoder.cls_token")
    v["pos_embed"] = g("blip.visual_encoder.pos_embed")
    for i in range(cfg.vision_layers):
        src = f"blip.visual_encoder.blocks.{i}"
        blk = v[f"block_{i}"]
        blk["ln1"] = {"scale": g(f"{src}.norm1.weight"), "bias": g(f"{src}.norm1.bias")}
        blk["ln2"] = {"scale": g(f"{src}.norm2.weight"), "bias": g(f"{src}.norm2.bias")}
        blk["qkv"] = {"kernel": t(f"{src}.attn.qkv.weight"), "bias": g(f"{src}.attn.qkv.bias")}
        blk["proj"] = {"kernel": t(f"{src}.attn.proj.weight"), "bias": g(f"{src}.attn.proj.bias")}
        blk["fc1"] = {"kernel": t(f"{src}.mlp.fc1.weight"), "bias": g(f"{src}.mlp.fc1.bias")}
        blk["fc2"] = {"kernel": t(f"{src}.mlp.fc2.weight"), "bias": g(f"{src}.mlp.fc2.bias")}
    v["ln_final"] = {"scale": g("blip.visual_encoder.norm.weight"), "bias": g("blip.visual_encoder.norm.bias")}

    te = out["text"]
    emb = "blip.text_encoder.bert.embeddings"
    te["word_embeddings"]["embedding"] = g(f"{emb}.word_embeddings.weight")
    te["position_embeddings"] = g(f"{emb}.position_embeddings.weight")
    te["ln_embed"] = {"scale": g(f"{emb}.LayerNorm.weight"), "bias": g(f"{emb}.LayerNorm.bias")}
    for i in range(cfg.text_layers):
        src = f"blip.text_encoder.bert.encoder.layer.{i}"
        lay = te[f"layer_{i}"]
        for mine, theirs in (("self_attn", "attention"), ("cross_attn", "crossattention")):
            lay[mine]["query"] = {"kernel": t(f"{src}.{theirs}.self.query.weight"), "bias": g(f"{src}.{theirs}.self.query.bias")}
            lay[mine]["key"] = {"kernel": t(f"{src}.{theirs}.self.key.weight"), "bias": g(f"{src}.{theirs}.self.key.bias")}
            lay[mine]["value"] = {"kernel": t(f"{src}.{theirs}.self.value.weight"), "bias": g(f"{src}.{theirs}.self.value.bias")}
            lay[mine]["out"] = {"kernel": t(f"{src}.{theirs}.output.dense.weight"), "bias": g(f"{src}.{theirs}.output.dense.bias")}
        lay["ln_self"] = {"scale": g(f"{src}.attention.output.LayerNorm.weight"), "bias": g(f"{src}.attention.output.LayerNorm.bias")}
        lay["ln_cross"] = {"scale": g(f"{src}.crossattention.output.LayerNorm.weight"), "bias": g(f"{src}.crossattention.output.LayerNorm.bias")}
        lay["fc1"] = {"kernel": t(f"{src}.intermediate.dense.weight"), "bias": g(f"{src}.intermediate.dense.bias")}
        lay["fc2"] = {"kernel": t(f"{src}.output.dense.weight"), "bias": g(f"{src}.output.dense.bias")}
        lay["ln_out"] = {"scale": g(f"{src}.output.LayerNorm.weight"), "bias": g(f"{src}.output.LayerNorm.bias")}

    hd = out["head"]
    for i, src_i in enumerate((0, 2, 4, 6)):
        hd[f"fc{i}"] = {"kernel": t(f"mlp.layers.{src_i}.weight"), "bias": g(f"mlp.layers.{src_i}.bias")}
    hd["out"] = {"kernel": t(f"mlp.layers.7.weight"), "bias": g(f"mlp.layers.7.bias")}

    # Shape-validate the mapped tree against the module's own init tree so a
    # wrong transpose / truncated checkpoint fails here, not at apply time.
    from sonicdiffusionbayeslab_tpu.models.weights import flatten

    ref_flat, out_flat = flatten(jax.tree.map(np.asarray, ref_params)), flatten(out)
    if ref_flat.keys() != out_flat.keys():
        extra = sorted(set(out_flat) ^ set(ref_flat))
        raise ValueError(f"ImageReward weight map tree mismatch, e.g. {extra[:5]}")
    bad = [k for k in ref_flat if ref_flat[k].shape != out_flat[k].shape]
    if bad:
        raise ValueError(
            f"ImageReward weight map shape mismatch at {bad[:5]} "
            f"(got {[out_flat[k].shape for k in bad[:5]]})"
        )
    return out
