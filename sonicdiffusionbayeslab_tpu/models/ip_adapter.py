"""IP-Adapter (Ye et al. 2023) — image-prompt conditioning.

Beyond-reference model family: a small projection maps a CLIP image
embedding to ``num_tokens`` extra context tokens, and every cross-attention
in the UNet gains decoupled ``to_k_ip``/``to_v_ip`` projections whose
attention output is added (scaled) to the text attention before ``to_out``
(``models/layers.py::Attention``).  The base UNet weights are untouched —
an adapter is ~22M params riding an otherwise frozen model.

Checkpoint layout (diffusers/official ``ip-adapter_sd15.bin``):

    {"image_proj": {"proj.weight", "proj.bias", "norm.weight", "norm.bias"},
     "ip_adapter": {"<idx>.to_k_ip.weight", "<idx>.to_v_ip.weight", ...}}

where ``<idx>`` is the odd attention-processor index in diffusers'
``unet.attn_processors`` iteration order (attn1/attn2 pairs, down blocks ->
mid -> up blocks).  :func:`ip_attn_paths` reproduces that order for our
module tree, which is what makes the converter a direct map.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.models.unet import UNetConfig


class ImageProjection(nn.Module):
    """CLIP image embedding [B, E] -> ``num_tokens`` context tokens
    [B, P, cross_attention_dim] (diffusers ``ImageProjection``)."""

    cross_attention_dim: int
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jax.Array) -> jax.Array:
        B = image_embeds.shape[0]
        x = nn.Dense(
            self.num_tokens * self.cross_attention_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="proj",
        )(image_embeds.astype(self.dtype))
        x = x.reshape(B, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="norm"
        )(x)


def ip_attn_paths(cfg: UNetConfig) -> List[str]:
    """Flax paths of every CROSS-attention module, in diffusers
    ``attn_processors`` order (down blocks -> mid -> up blocks; attn2 of
    each depth block)."""
    paths: List[str] = []
    n = len(cfg.block_out_channels)
    for lvl in range(n):
        if not cfg.cross_attention[lvl]:
            continue
        for j in range(cfg.layers_per_block):
            for d in range(cfg.depth_at(lvl)):
                paths.append(f"down_{lvl}_attn_{j}/block_{d}/attn2")
    for d in range(cfg.depth_at(n - 1)):
        paths.append(f"mid_attn/block_{d}/attn2")
    for lvl in reversed(range(n)):  # diffusers up_blocks[0] is the deepest
        if not cfg.cross_attention[lvl]:
            continue
        for j in range(cfg.layers_per_block + 1):
            for d in range(cfg.depth_at(lvl)):
                paths.append(f"up_{lvl}_attn_{j}/block_{d}/attn2")
    return paths


def ip_processor_indices(cfg: UNetConfig) -> List[int]:
    """The ``<idx>`` each cross-attention carries in the checkpoint: every
    attention (attn1 AND attn2) increments the processor counter, so cross
    attentions sit at odd indices."""
    return [2 * i + 1 for i in range(len(ip_attn_paths(cfg)))]


def load_ip_adapter(path: str | Path, engine, dtype=np.float32) -> Dict:
    """ip-adapter .bin -> {"unet_ip": partial UNet tree (to_k_ip/to_v_ip),
    "image_proj": tree, "num_tokens": int, "embed_dim": int}.

    Merge ``unet_ip`` into the converted base tree with
    :func:`merge_ip_params` and sample with
    ``engine.sample(ip_adapter={"image_embeds": ..., "scale": ...})``."""
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    proj_sd = {k: np.asarray(v.float().numpy(), dtype) for k, v in sd["image_proj"].items()}
    ip_sd = {k: np.asarray(v.float().numpy(), dtype) for k, v in sd["ip_adapter"].items()}

    cfg = engine.unet_config
    C = cfg.cross_attention_dim
    w = proj_sd["proj.weight"]  # [P*C, E]
    num_tokens = w.shape[0] // C
    image_proj = {
        "proj": {"kernel": np.transpose(w), "bias": proj_sd["proj.bias"]},
        "norm": {"scale": proj_sd["norm.weight"], "bias": proj_sd["norm.bias"]},
    }

    unet_ip: Dict = {}
    for path_str, idx in zip(ip_attn_paths(cfg), ip_processor_indices(cfg)):
        for name in ("to_k_ip", "to_v_ip"):
            src = f"{idx}.{name}.weight"
            if src not in ip_sd:
                raise KeyError(f"ip_adapter checkpoint missing {src} for {path_str}")
            node = unet_ip
            for part in path_str.split("/"):
                node = node.setdefault(part, {})
            node[name] = {"kernel": np.transpose(ip_sd[src])}
    extra = set(ip_sd) - {
        f"{i}.{n}.weight" for i in ip_processor_indices(cfg) for n in ("to_k_ip", "to_v_ip")
    }
    if extra:
        raise KeyError(f"ip_adapter checkpoint has unmapped tensors, e.g. {sorted(extra)[:3]}")
    return {
        "unet_ip": unet_ip,
        "image_proj": image_proj,
        "num_tokens": int(num_tokens),
        "embed_dim": int(w.shape[1]),
    }


def export_ip_adapter(unet_tree: Dict, image_proj: Dict, cfg: UNetConfig) -> Dict:
    """Inverse of :func:`load_ip_adapter` (round-trip testing): a UNet tree
    containing to_k_ip/to_v_ip + an image_proj tree -> the checkpoint dict
    layout."""
    ip_sd: Dict[str, np.ndarray] = {}
    for path_str, idx in zip(ip_attn_paths(cfg), ip_processor_indices(cfg)):
        node = unet_tree
        for part in path_str.split("/"):
            node = node[part]
        for name in ("to_k_ip", "to_v_ip"):
            ip_sd[f"{idx}.{name}.weight"] = np.transpose(np.asarray(node[name]["kernel"]))
    proj_sd = {
        "proj.weight": np.transpose(np.asarray(image_proj["proj"]["kernel"])),
        "proj.bias": np.asarray(image_proj["proj"]["bias"]),
        "norm.weight": np.asarray(image_proj["norm"]["scale"]),
        "norm.bias": np.asarray(image_proj["norm"]["bias"]),
    }
    return {"image_proj": proj_sd, "ip_adapter": ip_sd}


def extract_ip_params(unet_tree: Dict, cfg: UNetConfig) -> Dict:
    """Partial tree holding only the to_k_ip/to_v_ip entries of a UNet tree
    that includes them (engine.init_ip_params output) — the inverse
    selection of merge_ip_params."""
    out: Dict = {}
    for path_str in ip_attn_paths(cfg):
        node = unet_tree
        for part in path_str.split("/"):
            node = node[part]
        dst = out
        for part in path_str.split("/"):
            dst = dst.setdefault(part, {})
        for name in ("to_k_ip", "to_v_ip"):
            dst[name] = node[name]
    return out


def merge_ip_params(unet_tree: Dict, unet_ip: Dict) -> Dict:
    """Deep-merge the adapter's to_k_ip/to_v_ip entries into a (converted)
    base UNet tree — returns a new tree, base untouched."""

    def walk(base, extra):
        out = dict(base)
        for k, v in extra.items():
            out[k] = walk(base.get(k, {}), v) if isinstance(v, dict) and not _is_leaf(v) else v
        return out

    def _is_leaf(d):
        return isinstance(d, dict) and set(d) <= {"kernel", "bias", "scale"} and any(
            not isinstance(x, dict) for x in d.values()
        )

    return walk(unet_tree, unet_ip)
