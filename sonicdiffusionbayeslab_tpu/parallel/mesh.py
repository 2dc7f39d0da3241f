"""Device mesh + sharding layout for multi-chip sampling.

The reference is strictly single-GPU (SURVEY §2.3: no torch.distributed /
NCCL anywhere; parallelism = batch 32 on one card, base_experiment.py:21).
Here scaling is first-class and TPU-idiomatic: one ``jax.sharding.Mesh``
with a ``data`` axis (batch-parallel sampling — the embarrassingly parallel
axis that matters for this workload) and an optional ``model`` axis
(tensor parallelism over attention heads / MLP hidden / conv output
channels, for >1-chip-per-model setups).  XLA GSPMD inserts all
collectives; there is no hand-rolled transport.

Layout rules follow the scaling-book recipe: annotate params + batch,
let the compiler place ``all_gather``/``psum`` on ICI.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    n_seq: int = 1,
) -> Mesh:
    """('data', 'seq', 'model') mesh. Defaults: all devices on the data axis.

    ``seq`` is the context/sequence-parallel axis: it shards the latent
    spatial height, so one *sample* spans n_seq chips — GSPMD inserts the
    conv halo exchanges and attention all-gathers.  Size 1 (the default)
    degenerates to the plain DP(+TP) layout.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq)
    if n_data * n_model * n_seq != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_seq}x{n_model} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_seq, n_model)
    return Mesh(arr, ("data", "seq", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def latent_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] latents: batch over 'data', spatial height over 'seq'."""
    if "seq" in mesh.shape and mesh.shape["seq"] > 1:
        return NamedSharding(mesh, P("data", "seq"))
    return batch_sharding(mesh)


def shard_batch(mesh: Mesh, *arrays):
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out[0] if len(out) == 1 else out


def shard_latents(mesh: Mesh, latents):
    return jax.device_put(latents, latent_sharding(mesh))


# --------------------------------------------------------------------- TP
# Param-path regex -> PartitionSpec over the 'model' axis.  Dense kernels
# are [in, out]; conv kernels [h, w, in, out]; norm scales replicated.
_TP_RULES: Dict[str, P] = {
    # attention projections: split heads (out dim of q/k/v, in dim of out-proj)
    r".*/(to_q|to_k|to_v|q_proj|k_proj|v_proj)/kernel$": P(None, "model"),
    # fused projections (SDBL_FUSED_QKV trees): split the concatenated out dim
    r".*/(to_qkv|to_kv)/kernel$": P(None, "model"),
    r".*/(to_out|out_proj)/kernel$": P("model", None),
    # transformer MLP: split hidden
    r".*/ff/proj_in/kernel$": P(None, "model"),
    r".*/ff/proj_out/kernel$": P("model", None),
    r".*/fc1/kernel$": P(None, "model"),
    r".*/fc2/kernel$": P("model", None),
    # convs: split output channels (resnet conv1) / input channels (conv2)
    r".*/conv1/kernel$": P(None, None, None, "model"),
    r".*/conv2/kernel$": P(None, None, "model", None),
    # MMDiT (SD3) joint attention, context stream: the add_* projections
    # must split heads exactly like the image stream's to_q/k/v above so the
    # [image ++ context] token concat sees one consistent head sharding.
    r".*/(add_q_proj|add_k_proj|add_v_proj)/kernel$": P(None, "model"),
    r".*/to_add_out/kernel$": P("model", None),
    # MMDiT context-stream MLP (the image stream's 'ff' matches the UNet
    # rule above; 'ff_context' needs its own — '.*/ff/' does not match it).
    r".*/ff_context/proj_in/kernel$": P(None, "model"),
    r".*/ff_context/proj_out/kernel$": P("model", None),
    # T5 encoder (SD3 triple-tower, models/t5.py): head-split q/k/v (d_kv=64
    # divides evenly for any model-axis size that divides num_heads=64) and
    # hidden-split gated-GELU FF.  T5-XXL is ~9.4 GB bf16 — TP over 'model'
    # is the multi-chip path for `use_t5: true` (docs/MODELS.md); the
    # relative-position bias embedding stays replicated (tiny) and GSPMD
    # reshards it into the head-sharded score einsum.
    r".*/attn/(q|k|v)/kernel$": P(None, "model"),
    r".*/attn/o/kernel$": P("model", None),
    r".*/(wi_0|wi_1)/kernel$": P(None, "model"),
    r".*/wo/kernel$": P("model", None),
}


def param_sharding_rules() -> Dict[str, P]:
    return dict(_TP_RULES)


def _spec_for(path: str, rules: Dict[str, P]) -> P:
    for pat, spec in rules.items():
        if re.match(pat, path):
            return spec
    return P()  # replicated


def shard_params(params, mesh: Mesh, rules: Optional[Dict[str, P]] = None):
    """Place a param tree on the mesh per TP rules (replicated by default).

    With n_model == 1 every spec degenerates to replication — the pure-DP
    layout.  Dimensions not divisible by the axis size fall back to
    replication (documented: SD-1.5 head counts are not always powers of 2).
    """
    rules = _TP_RULES if rules is None else rules
    axis_size = mesh.shape["model"]

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    placed = []
    for path, leaf in flat:
        path_str = "/".join(
            getattr(k, "key", getattr(k, "idx", None)) or str(k) for k in path
        )
        spec = _spec_for(path_str, rules) if axis_size > 1 else P()
        # Divisibility guard: replicate anything the axis can't split evenly.
        if axis_size > 1 and any(
            s is not None and leaf.shape[i] % axis_size != 0
            for i, s in enumerate(spec)
        ):
            spec = P()
        placed.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, placed)
