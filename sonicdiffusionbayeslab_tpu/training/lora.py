"""Functional LoRA adapters over Flax param trees.

Inference-side LoRA (``models/weights.py::merge_lora``) fuses externally
trained adapters into the base weights (the reference's ``fuse_lora`` path,
consistency_model.py:20-21).  This module is the training side: low-rank
factors held OUTSIDE the frozen base tree, merged functionally inside the
jitted train step — so the optimizer state and gradients cover only the
adapter parameters (two skinny matrices per target), which is the
TPU-friendly formulation (no in-place mutation, one fused ``A @ B`` AXPY
per target at apply time).

Layout: a Flax ``Dense`` kernel is ``[in, out]``; an adapter is
``{"a": [in, r], "b": [r, out]}`` and the effective kernel is
``W + (alpha / r) * scale * (a @ b)``.  ``a`` is Gaussian-initialized,
``b`` starts at zero, so step 0 reproduces the base model exactly (standard
LoRA init, Hu et al. 2021).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Attention projections + transformer MLP — the classic LoRA target set for
# SD UNets (what LCM-LoRA / kohya adapters cover).
DEFAULT_TARGETS = r".*/(to_q|to_k|to_v|to_out|to_qkv|to_kv)/kernel$"
ATTN_AND_FF_TARGETS = (
    r".*/(to_q|to_k|to_v|to_out|to_qkv|to_kv|ff/proj_in|ff/proj_out)/kernel$"
)
# MMDiT joint attention: both streams' projections (the image-stream to_*
# set is covered by DEFAULT_TARGETS; SD3 LoRAs also train the context
# stream's add_*_proj / to_add_out).
MMDIT_TARGETS = (
    r".*/(to_q|to_k|to_v|to_out|add_q_proj|add_k_proj|add_v_proj|to_add_out)/kernel$"
)


def _flat_paths(tree) -> Dict[str, jax.Array]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        out["/".join(getattr(k, "key", str(k)) for k in path)] = leaf
    return out


def init_lora(
    params: dict,
    rank: int,
    key: jax.Array,
    targets: str = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> dict:
    """Nested adapter tree mirroring ``params``' structure at the matched
    kernels: ``{...: {"a": [in, r], "b": [r, out]}}``.  Only 2-D (Dense)
    kernels are eligible; convs are left to full fine-tuning."""
    pat = re.compile(targets)
    flat = _flat_paths(params)
    matched = {p: v for p, v in flat.items() if pat.match(p) and v.ndim == 2}
    if not matched:
        raise ValueError(f"no LoRA targets matched {targets!r}")
    adapters: dict = {}
    keys = jax.random.split(key, len(matched))
    for (path, kernel), k in zip(sorted(matched.items()), keys):
        d_in, d_out = int(kernel.shape[0]), int(kernel.shape[1])
        node = adapters
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = {
            "a": (jax.random.normal(k, (d_in, rank), dtype) / max(d_in, 1) ** 0.5),
            "b": jnp.zeros((rank, d_out), dtype),
        }
    return adapters


def apply_lora(params: dict, adapters: dict, scale: float = 1.0, alpha: Optional[float] = None) -> dict:
    """Merged tree: matched kernels become ``W + (alpha/r)*scale*(a@b)``.

    Pure function of both trees — safe (and intended) to call inside jit;
    XLA fuses each low-rank product into the surrounding graph."""

    def walk(p_node, a_node):
        if isinstance(a_node, dict) and set(a_node.keys()) == {"a", "b"} and not isinstance(
            p_node, dict
        ):
            r = a_node["a"].shape[-1]
            eff_alpha = float(alpha) if alpha is not None else float(r)
            delta = (a_node["a"] @ a_node["b"]) * (eff_alpha / r) * scale
            return (p_node.astype(jnp.float32) + delta.astype(jnp.float32)).astype(p_node.dtype)
        if isinstance(a_node, dict):
            out = dict(p_node)
            for k, sub in a_node.items():
                out[k] = walk(p_node[k], sub)
            return out
        return p_node

    return walk(params, adapters)


def lora_to_peft_state_dict(
    adapters: dict,
    name_map: Dict[str, Tuple],
    prefix: str = "unet",
) -> Dict[str, np.ndarray]:
    """Export adapters as a peft-layout torch state dict
    (``unet.<module>.lora_A.weight`` [r, in] / ``lora_B.weight`` [out, r] +
    ``alpha``), the layout ``models/weights.py::merge_lora`` consumes — so a
    LoRA trained here round-trips through the inference-side fuse path."""
    out: Dict[str, np.ndarray] = {}
    for path, node in _flat_adapter_items(adapters):
        entry = name_map.get(path)
        if entry is None:
            raise KeyError(f"no name-map entry for LoRA target {path}")
        src = entry[0]
        if isinstance(src, tuple):
            raise ValueError(f"fused kernel {path} cannot be exported to peft layout")
        base = src[: -len(".weight")]
        r = node["a"].shape[-1]
        out[f"{prefix}.{base}.lora_A.weight"] = np.asarray(node["a"], np.float32).T
        out[f"{prefix}.{base}.lora_B.weight"] = np.asarray(node["b"], np.float32).T
        out[f"{prefix}.{base}.alpha"] = np.asarray(float(r), np.float32)
    return out


def _flat_adapter_items(adapters: dict, prefix: str = ""):
    for k, v in adapters.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict) and set(v.keys()) == {"a", "b"}:
            yield path, v
        elif isinstance(v, dict):
            yield from _flat_adapter_items(v, path)
