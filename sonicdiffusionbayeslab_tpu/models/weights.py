"""HF (torch) checkpoint -> Flax param-tree conversion + orbax caching.

Replaces the reference's hub-download path (``from_pretrained(...,
torch_dtype=fp16)``, src/experiments/base_experiment.py:57-63) with an
offline converter: point it at a local diffusers-layout snapshot
(``unet/diffusion_pytorch_model.bin``/``.safetensors``, ``vae/...``,
``text_encoder/pytorch_model.bin``) and it produces this package's NHWC
Flax trees, cached as an orbax checkpoint so conversion happens once.

Name mapping is *derived from our module tree* (``target_to_source``):
for every Flax param path we compute the diffusers tensor name and the
transform (torch OIHW conv -> HWIO kernel, [out,in] linear -> [in,out]
kernel, 1x1-conv projections -> dense kernels).  The inverse transform is
exported for round-trip tests, so the mapping is validated without needing
diffusers installed.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict, Tuple

import numpy as np

from sonicdiffusionbayeslab_tpu.models.unet import UNetConfig

Transform = Callable[[np.ndarray], np.ndarray]


def _conv(w):  # torch OIHW -> flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _conv_inv(w):
    return np.transpose(w, (3, 2, 0, 1))


def _lin(w):  # torch [out, in] -> flax [in, out]
    return np.transpose(w)


def _conv1x1_to_dense(w):  # torch [out, in, 1, 1] -> dense [in, out]
    return np.transpose(w[:, :, 0, 0])


def _conv1x1_to_dense_inv(w):
    return np.transpose(w)[:, :, None, None]


def _id(w):
    return np.asarray(w)


def _lin_concat(arrs):  # [torch [out,in]] x k -> flax [in, k*out]
    return np.concatenate([np.transpose(a) for a in arrs], axis=1)


def _lin_concat_inv(w, k):  # flax [in, k*out] -> [torch [out,in]] x k
    return [np.transpose(p) for p in np.split(w, k, axis=1)]


# ---------------------------------------------------------------- UNet map
def unet_name_map(cfg: UNetConfig) -> Dict[str, Tuple[str, Transform, Transform]]:
    """{flax_path: (diffusers_name, fwd_transform, inv_transform)}.

    Flax paths use '/'-joined module names; leaf names kernel/bias/scale.
    """
    m: Dict[str, Tuple[str, Transform, Transform]] = {}

    def conv(dst, src):
        m[f"{dst}/kernel"] = (f"{src}.weight", _conv, _conv_inv)
        m[f"{dst}/bias"] = (f"{src}.bias", _id, _id)

    def dense(dst, src, bias=True):
        m[f"{dst}/kernel"] = (f"{src}.weight", _lin, _lin)
        if bias:
            m[f"{dst}/bias"] = (f"{src}.bias", _id, _id)

    def norm(dst, src):
        m[f"{dst}/scale"] = (f"{src}.weight", _id, _id)
        m[f"{dst}/bias"] = (f"{src}.bias", _id, _id)

    def ln(dst, src):
        m[f"{dst}/scale"] = (f"{src}.weight", _id, _id)
        m[f"{dst}/bias"] = (f"{src}.bias", _id, _id)

    def resnet(dst, src):
        norm(f"{dst}/norm1", f"{src}.norm1")
        conv(f"{dst}/conv1", f"{src}.conv1")
        dense(f"{dst}/time_emb_proj", f"{src}.time_emb_proj")
        norm(f"{dst}/norm2", f"{src}.norm2")
        conv(f"{dst}/conv2", f"{src}.conv2")
        # conv_shortcut exists only when channels change; mapped lazily by
        # presence in the target tree (convert() skips absent paths).
        conv(f"{dst}/conv_shortcut", f"{src}.conv_shortcut")

    def xfmr(dst, src, depth, linear_proj=False):
        norm(f"{dst}/norm", f"{src}.norm")
        if linear_proj:  # SDXL: use_linear_projection=True
            dense(f"{dst}/proj_in", f"{src}.proj_in")
            dense(f"{dst}/proj_out", f"{src}.proj_out")
        else:  # SD-1.5: 1x1-conv projections
            m[f"{dst}/proj_in/kernel"] = (f"{src}.proj_in.weight", _conv1x1_to_dense, _conv1x1_to_dense_inv)
            m[f"{dst}/proj_in/bias"] = (f"{src}.proj_in.bias", _id, _id)
            m[f"{dst}/proj_out/kernel"] = (f"{src}.proj_out.weight", _conv1x1_to_dense, _conv1x1_to_dense_inv)
            m[f"{dst}/proj_out/bias"] = (f"{src}.proj_out.bias", _id, _id)
        for d in range(depth):
            b_dst, b_src = f"{dst}/block_{d}", f"{src}.transformer_blocks.{d}"
            for a in ("attn1", "attn2"):
                for p in ("to_q", "to_k", "to_v"):
                    dense(f"{b_dst}/{a}/{p}", f"{b_src}.{a}.{p}", bias=False)
                dense(f"{b_dst}/{a}/to_out", f"{b_src}.{a}.to_out.0")
            # Fused-projection variants (SDBL_FUSED_QKV=1 param tree): both
            # entry sets coexist in the map; convert() reads whichever paths
            # the target tree actually has.
            m[f"{b_dst}/attn1/to_qkv/kernel"] = (
                tuple(f"{b_src}.attn1.{p}.weight" for p in ("to_q", "to_k", "to_v")),
                _lin_concat,
                lambda w: _lin_concat_inv(w, 3),
            )
            m[f"{b_dst}/attn2/to_kv/kernel"] = (
                tuple(f"{b_src}.attn2.{p}.weight" for p in ("to_k", "to_v")),
                _lin_concat,
                lambda w: _lin_concat_inv(w, 2),
            )
            dense(f"{b_dst}/ff/proj_in", f"{b_src}.ff.net.0.proj")
            dense(f"{b_dst}/ff/proj_out", f"{b_src}.ff.net.2")
            for i in (1, 2, 3):
                ln(f"{b_dst}/norm{i}", f"{b_src}.norm{i}")

    conv("conv_in", "conv_in")
    dense("time_embedding/fc1", "time_embedding.linear_1")
    dense("time_embedding/fc2", "time_embedding.linear_2")
    if cfg.time_cond_proj_dim is not None:  # full-LCM guidance embedding
        dense("time_embedding/cond_proj", "time_embedding.cond_proj", bias=False)
    if cfg.addition_time_embed_dim is not None:  # SDXL text_time conditioning
        dense("add_embedding/fc1", "add_embedding.linear_1")
        dense("add_embedding/fc2", "add_embedding.linear_2")
    # SD-2.x and SDXL use linear transformer projections (diffusers
    # use_linear_projection); SD-1.5's proj_in/out are 1x1 convs.
    linear_proj = cfg.linear_projection

    n = len(cfg.block_out_channels)
    for lvl in range(n):
        for j in range(cfg.layers_per_block):
            resnet(f"down_{lvl}_res_{j}", f"down_blocks.{lvl}.resnets.{j}")
            if cfg.cross_attention[lvl]:
                xfmr(
                    f"down_{lvl}_attn_{j}",
                    f"down_blocks.{lvl}.attentions.{j}",
                    cfg.depth_at(lvl),
                    linear_proj,
                )
        if lvl < n - 1:
            conv(f"down_{lvl}_downsample/conv", f"down_blocks.{lvl}.downsamplers.0.conv")

    resnet("mid_res_0", "mid_block.resnets.0")
    resnet("mid_res_1", "mid_block.resnets.1")
    xfmr("mid_attn", "mid_block.attentions.0", cfg.depth_at(n - 1), linear_proj)

    for lvl in range(n):
        k = n - 1 - lvl  # diffusers up_blocks index
        for j in range(cfg.layers_per_block + 1):
            resnet(f"up_{lvl}_res_{j}", f"up_blocks.{k}.resnets.{j}")
            if cfg.cross_attention[lvl]:
                xfmr(f"up_{lvl}_attn_{j}", f"up_blocks.{k}.attentions.{j}",
                     cfg.depth_at(lvl), linear_proj)
        if lvl > 0:
            conv(f"up_{lvl}_upsample/conv", f"up_blocks.{k}.upsamplers.0.conv")

    norm("conv_norm_out", "conv_norm_out")
    conv("conv_out", "conv_out")
    return m


# ------------------------------------------------------------ ControlNet map
def controlnet_name_map(cfg: UNetConfig) -> Dict[str, Tuple[str, Transform, Transform]]:
    """diffusers ``ControlNetModel`` state dict -> models/controlnet.py tree.

    The encoder copy (conv_in / time_embedding / down_* / mid_*) shares the
    UNet's module names on both sides, so its entries come straight from
    ``unet_name_map``; the ControlNet-only parts are the conditioning
    embedding and the zero-conv heads."""
    base = unet_name_map(cfg)
    m: Dict[str, Tuple[str, Transform, Transform]] = {}
    for k, v in base.items():
        top = k.split("/")[0]
        if (
            top in ("conv_in", "time_embedding", "add_embedding")
            or top.startswith("down_")
            or top.startswith("mid_")
        ):
            m[k] = v

    def conv(dst, src):
        m[f"{dst}/kernel"] = (f"{src}.weight", _conv, _conv_inv)
        m[f"{dst}/bias"] = (f"{src}.bias", _id, _id)

    conv("cond_embedding/conv_in", "controlnet_cond_embedding.conv_in")
    from sonicdiffusionbayeslab_tpu.models.controlnet import COND_EMBED_CHANNELS

    for j in range(2 * (len(COND_EMBED_CHANNELS) - 1)):
        conv(f"cond_embedding/blocks_{j}", f"controlnet_cond_embedding.blocks.{j}")
    conv("cond_embedding/conv_out", "controlnet_cond_embedding.conv_out")

    n = len(cfg.block_out_channels)
    n_skips = 1 + sum(
        cfg.layers_per_block + (1 if lvl < n - 1 else 0) for lvl in range(n)
    )
    for i in range(n_skips):
        conv(f"control_out_{i}", f"controlnet_down_blocks.{i}")
    conv("control_mid", "controlnet_mid_block")
    return m


def load_controlnet_checkpoint(snapshot_dir: str | Path, engine, dtype=np.float32) -> dict:
    """diffusers ControlNet snapshot dir (or the dir holding its
    ``diffusion_pytorch_model.bin``) -> ControlNet param tree, validated
    against the engine's random-init tree."""
    snapshot_dir = Path(snapshot_dir)
    ref = engine.init_controlnet_params(seed=0)
    sd = None
    for name in ("diffusion_pytorch_model.bin", "pytorch_model.bin",
                 "diffusion_pytorch_model.safetensors", "model.safetensors"):
        if (snapshot_dir / name).exists():
            sd = load_torch_state_dict(snapshot_dir / name)
            break
    if sd is None:
        raise FileNotFoundError(f"no checkpoint under {snapshot_dir}")
    return convert(sd, controlnet_name_map(engine.unet_config),
                   flatten(ref).keys(), dtype)


# ----------------------------------------------------------------- VAE map
def vae_name_map(n_levels: int, layers_per_block: int) -> Dict[str, Tuple[str, Transform, Transform]]:
    m: Dict[str, Tuple[str, Transform, Transform]] = {}

    def conv(dst, src):
        m[f"{dst}/kernel"] = (f"{src}.weight", _conv, _conv_inv)
        m[f"{dst}/bias"] = (f"{src}.bias", _id, _id)

    def norm(dst, src):
        m[f"{dst}/scale"] = (f"{src}.weight", _id, _id)
        m[f"{dst}/bias"] = (f"{src}.bias", _id, _id)

    def resnet(dst, src):
        norm(f"{dst}/norm1", f"{src}.norm1")
        conv(f"{dst}/conv1", f"{src}.conv1")
        norm(f"{dst}/norm2", f"{src}.norm2")
        conv(f"{dst}/conv2", f"{src}.conv2")
        conv(f"{dst}/conv_shortcut", f"{src}.conv_shortcut")

    def attn(dst, src):
        norm(f"{dst}/norm", f"{src}.group_norm")
        for mine, theirs in (("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v")):
            m[f"{dst}/attn/{mine}/kernel"] = (f"{src}.{theirs}.weight", _lin, _lin)
        m[f"{dst}/attn/to_out/kernel"] = (f"{src}.to_out.0.weight", _lin, _lin)
        m[f"{dst}/attn/to_out/bias"] = (f"{src}.to_out.0.bias", _id, _id)

    # decoder
    conv("decoder/conv_in", "decoder.conv_in")
    resnet("decoder/mid_res_0", "decoder.mid_block.resnets.0")
    resnet("decoder/mid_res_1", "decoder.mid_block.resnets.1")
    attn("decoder/mid_attn", "decoder.mid_block.attentions.0")
    for i in range(n_levels):
        for j in range(layers_per_block + 1):
            resnet(f"decoder/up_{i}_res_{j}", f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n_levels - 1:
            conv(f"decoder/up_{i}_upsample/conv", f"decoder.up_blocks.{i}.upsamplers.0.conv")
    norm("decoder/norm_out", "decoder.conv_norm_out")
    conv("decoder/conv_out", "decoder.conv_out")
    # encoder
    conv("encoder/conv_in", "encoder.conv_in")
    for i in range(n_levels):
        for j in range(layers_per_block):
            resnet(f"encoder/down_{i}_res_{j}", f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n_levels - 1:
            conv(f"encoder/down_{i}_downsample/conv", f"encoder.down_blocks.{i}.downsamplers.0.conv")
    resnet("encoder/mid_res_0", "encoder.mid_block.resnets.0")
    resnet("encoder/mid_res_1", "encoder.mid_block.resnets.1")
    attn("encoder/mid_attn", "encoder.mid_block.attentions.0")
    norm("encoder/norm_out", "encoder.conv_norm_out")
    conv("encoder/conv_out", "encoder.conv_out")
    conv("post_quant_conv", "post_quant_conv")
    conv("quant_conv", "quant_conv")
    return m


# ------------------------------------------------------------ CLIP text map
def _clip_layer_entries(m, src: str, dst: str) -> None:
    """One HF CLIPEncoderLayer -> our CLIPLayer (shared by text/vision)."""
    for a in ("q_proj", "k_proj", "v_proj", "out_proj"):
        m[f"{dst}/attn/{a}/kernel"] = (f"{src}.self_attn.{a}.weight", _lin, _lin)
        m[f"{dst}/attn/{a}/bias"] = (f"{src}.self_attn.{a}.bias", _id, _id)
    for mine, theirs in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
        m[f"{dst}/{mine}/scale"] = (f"{src}.{theirs}.weight", _id, _id)
        m[f"{dst}/{mine}/bias"] = (f"{src}.{theirs}.bias", _id, _id)
    for fc in ("fc1", "fc2"):
        m[f"{dst}/{fc}/kernel"] = (f"{src}.mlp.{fc}.weight", _lin, _lin)
        m[f"{dst}/{fc}/bias"] = (f"{src}.mlp.{fc}.bias", _id, _id)


def clip_text_name_map(
    num_layers: int, src_prefix: str = "text_model", dst_prefix: str = ""
) -> Dict[str, Tuple[str, Transform, Transform]]:
    m: Dict[str, Tuple[str, Transform, Transform]] = {}
    p, d = src_prefix, (dst_prefix + "/" if dst_prefix else "")
    m[f"{d}token_embedding/embedding"] = (f"{p}.embeddings.token_embedding.weight", _id, _id)
    m[f"{d}position_embedding"] = (f"{p}.embeddings.position_embedding.weight", _id, _id)
    for i in range(num_layers):
        _clip_layer_entries(m, f"{p}.encoder.layers.{i}", f"{d}layer_{i}")
    m[f"{d}final_ln/scale"] = (f"{p}.final_layer_norm.weight", _id, _id)
    m[f"{d}final_ln/bias"] = (f"{p}.final_layer_norm.bias", _id, _id)
    return m


def clip_dual_name_map(vision_layers: int, text_layers: int) -> Dict[str, Tuple[str, Transform, Transform]]:
    """HF ``CLIPModel`` state dict -> our ``CLIPDualEncoder`` tree (the
    metric backend for CLIP score / FID fallback, metrics/metrics.py)."""
    m = clip_text_name_map(text_layers, "text_model", "text")
    p, d = "vision_model", "vision/"
    m[f"{d}patch_embedding/kernel"] = (f"{p}.embeddings.patch_embedding.weight", _conv, _conv_inv)
    m[f"{d}class_embedding"] = (f"{p}.embeddings.class_embedding", _id, _id)
    m[f"{d}position_embedding"] = (f"{p}.embeddings.position_embedding.weight", _id, _id)
    # HF's vision pre-LN attribute is literally spelled "pre_layrnorm".
    m[f"{d}pre_ln/scale"] = (f"{p}.pre_layrnorm.weight", _id, _id)
    m[f"{d}pre_ln/bias"] = (f"{p}.pre_layrnorm.bias", _id, _id)
    for i in range(vision_layers):
        _clip_layer_entries(m, f"{p}.encoder.layers.{i}", f"{d}layer_{i}")
    m[f"{d}post_ln/scale"] = (f"{p}.post_layernorm.weight", _id, _id)
    m[f"{d}post_ln/bias"] = (f"{p}.post_layernorm.bias", _id, _id)
    m["visual_projection/kernel"] = ("visual_projection.weight", _lin, _lin)
    m["text_projection/kernel"] = ("text_projection.weight", _lin, _lin)
    return m


def load_clip_checkpoint(snapshot_dir: str | Path, ref_params: dict, *,
                         vision_layers: int, text_layers: int, dtype=np.float32) -> dict:
    """HF CLIPModel snapshot dir (pytorch_model.bin / model.safetensors) ->
    CLIPDualEncoder params validated against ``ref_params``' tree."""
    snapshot_dir = Path(snapshot_dir)
    for name in ("pytorch_model.bin", "model.safetensors"):
        if (snapshot_dir / name).exists():
            sd = load_torch_state_dict(snapshot_dir / name)
            break
    else:
        raise FileNotFoundError(f"no CLIP checkpoint under {snapshot_dir}")
    return convert(sd, clip_dual_name_map(vision_layers, text_layers),
                   flatten(ref_params).keys(), dtype)


# ---------------------------------------------------------------- plumbing
def flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def convert(
    source: Dict[str, np.ndarray],
    name_map: Dict[str, Tuple[str, Transform, Transform]],
    target_paths,
    dtype=np.float32,
) -> dict:
    """Build the Flax tree for ``target_paths`` from a torch state dict."""
    flat = {}
    missing = []
    for path in target_paths:
        if path not in name_map:
            missing.append(path)
            continue
        src_name, fwd, _ = name_map[path]
        if isinstance(src_name, tuple):  # fused entry: k source tensors -> 1 target
            absent = [s for s in src_name if s not in source]
            if absent:
                missing.append(f"{path} <- {absent[0]}")
                continue
            arrs = [np.asarray(source[s], dtype=np.float32) for s in src_name]
            flat[path] = fwd(arrs).astype(dtype)
            continue
        if src_name not in source:
            missing.append(f"{path} <- {src_name}")
            continue
        flat[path] = fwd(np.asarray(source[src_name], dtype=np.float32)).astype(dtype)
    if missing:
        raise KeyError(f"weight conversion missing {len(missing)} tensors, e.g. {missing[:5]}")
    return unflatten(flat)


def invert(
    tree: dict, name_map: Dict[str, Tuple[str, Transform, Transform]]
) -> Dict[str, np.ndarray]:
    """Flax tree -> torch-layout state dict (round-trip testing / export)."""
    out = {}
    for path, v in flatten(tree).items():
        src_name, _, inv = name_map[path]
        if isinstance(src_name, tuple):  # fused entry: split back per source
            for s, arr in zip(src_name, inv(np.asarray(v, np.float32))):
                out[s] = arr
            continue
        out[src_name] = inv(np.asarray(v, np.float32))
    return out


def load_torch_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    """Load a .bin (torch pickle) or .safetensors file to numpy."""
    path = Path(path)
    if path.suffix == ".safetensors":
        try:
            from safetensors.numpy import load_file

            return dict(load_file(str(path)))
        except ImportError as e:
            raise RuntimeError("safetensors not installed; use a .bin checkpoint") from e
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def load_sd_checkpoint(snapshot_dir: str | Path, engine, dtype=np.float32) -> dict:
    """diffusers-layout snapshot dir -> full {unet, vae, text} param tree,
    shaped/validated against ``engine``'s randomly-initialized tree."""
    snapshot_dir = Path(snapshot_dir)
    # Shape-only init: only key NAMES are consumed below, and a real init
    # would materialize the whole tree on device (for SD3's use_t5 path,
    # T5-XXL alone is ~9.5 GB — the staged-T5 single-chip mode cannot
    # afford a throwaway device copy).
    import functools

    import jax

    ref = jax.eval_shape(functools.partial(engine.init_params, seed=0))

    def find(sub):
        d = snapshot_dir / sub
        for name in ("diffusion_pytorch_model.bin", "pytorch_model.bin",
                     "diffusion_pytorch_model.safetensors", "model.safetensors"):
            if (d / name).exists():
                return load_torch_state_dict(d / name)
        raise FileNotFoundError(f"no checkpoint under {d}")

    out = {
        "unet": convert(find("unet"), unet_name_map(engine.unet_config),
                        flatten(ref["unet"]).keys(), dtype),
        "vae": convert(
            find("vae"),
            vae_name_map(len(engine.vae_config.block_out_channels), engine.vae_config.layers_per_block),
            flatten(ref["vae"]).keys(),
            dtype,
        ),
        "text": convert(find("text_encoder"), clip_text_name_map(engine.text_config.num_layers),
                        flatten(ref["text"]).keys(), dtype),
    }
    return out


def mmdit_name_map(cfg) -> Dict[str, Tuple[str, Transform, Transform]]:
    """{flax_path: (diffusers SD3Transformer2DModel name, fwd, inv)}.

    The patch embed is diffusers' Conv2d(p, stride=p) folded to a matmul:
    weight [O, C, ph, pw] -> [ph*pw*C, O] with (ph, pw, c) row order —
    exactly the patchify order models/mmdit.py produces.  The fixed sincos
    ``pos_embed.pos_embed`` buffer is NOT mapped: mmdit.py recomputes the
    identical table (same meshgrid/crop sequence)."""
    m: Dict[str, Tuple[str, Transform, Transform]] = {}

    def dense(dst, src):
        m[f"{dst}/kernel"] = (f"{src}.weight", _lin, _lin)
        m[f"{dst}/bias"] = (f"{src}.bias", _id, _id)

    def patch(w):  # [O, C, ph, pw] -> [ph*pw*C, O]
        w = np.asarray(w)
        return w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])

    def patch_inv(w):
        o = w.shape[-1]
        p = cfg.patch_size
        return w.reshape(p, p, -1, o).transpose(3, 2, 0, 1)

    m["patch_proj/kernel"] = ("pos_embed.proj.weight", patch, patch_inv)
    m["patch_proj/bias"] = ("pos_embed.proj.bias", _id, _id)
    dense("timestep_embedder/fc1", "time_text_embed.timestep_embedder.linear_1")
    dense("timestep_embedder/fc2", "time_text_embed.timestep_embedder.linear_2")
    dense("text_embedder/fc1", "time_text_embed.text_embedder.linear_1")
    dense("text_embedder/fc2", "time_text_embed.text_embedder.linear_2")
    dense("context_embedder", "context_embedder")
    for i in range(cfg.depth):
        d, s = f"blocks_{i}", f"transformer_blocks.{i}"
        dense(f"{d}/norm1/linear", f"{s}.norm1.linear")
        dense(f"{d}/norm1_context/linear", f"{s}.norm1_context.linear")
        for proj in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            dense(f"{d}/{proj}", f"{s}.attn.{proj}")
        dense(f"{d}/to_out", f"{s}.attn.to_out.0")
        if cfg.qk_norm:
            for ours, theirs in (("norm_q", "norm_q"), ("norm_k", "norm_k"),
                                 ("norm_added_q", "norm_added_q"),
                                 ("norm_added_k", "norm_added_k")):
                m[f"{d}/{ours}/scale"] = (f"{s}.attn.{theirs}.weight", _id, _id)
        dense(f"{d}/ff/proj_in", f"{s}.ff.net.0.proj")
        dense(f"{d}/ff/proj_out", f"{s}.ff.net.2")
        if i < cfg.depth - 1:  # final block: context stream is k/v-only
            dense(f"{d}/to_add_out", f"{s}.attn.to_add_out")
            dense(f"{d}/ff_context/proj_in", f"{s}.ff_context.net.0.proj")
            dense(f"{d}/ff_context/proj_out", f"{s}.ff_context.net.2")
    dense("norm_out/linear", "norm_out.linear")
    dense("proj_out", "proj_out")
    return m


def t5_name_map(num_layers: int) -> Dict[str, Tuple[str, Transform, Transform]]:
    """{flax_path: (HF T5EncoderModel name, fwd, inv)} for models/t5.py.

    The shared relative-position-bias embedding lives in block 0's
    attention in HF; our module keeps it top-level (one table, every layer
    reads it — identical semantics)."""
    m: Dict[str, Tuple[str, Transform, Transform]] = {
        "token_embedding/embedding": ("shared.weight", _id, _id),
        "relative_attention_bias": (
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
            _id, _id),
        "final_ln/scale": ("encoder.final_layer_norm.weight", _id, _id),
    }
    for i in range(num_layers):
        d, s = f"block_{i}", f"encoder.block.{i}"
        for p in "qkvo":
            m[f"{d}/attn/{p}/kernel"] = (f"{s}.layer.0.SelfAttention.{p}.weight", _lin, _lin)
        m[f"{d}/ln1/scale"] = (f"{s}.layer.0.layer_norm.weight", _id, _id)
        for p in ("wi_0", "wi_1", "wo"):
            m[f"{d}/{p}/kernel"] = (f"{s}.layer.1.DenseReluDense.{p}.weight", _lin, _lin)
        m[f"{d}/ln2/scale"] = (f"{s}.layer.1.layer_norm.weight", _id, _id)
    return m


def load_sd3_checkpoint(snapshot_dir: str | Path, engine, dtype=np.float32) -> dict:
    """diffusers SD3 snapshot dir -> {unet, vae, text, text2, text_proj,
    text2_proj} tree for :class:`~.sd3.SD3Engine` (transformer/ holds the
    MMDiT; both text encoders are CLIPTextModelWithProjection).  T5
    (text_encoder_3) is loaded only when the engine was built with
    ``use_t5=True`` — the default engine runs the CLIP-only drop-T5
    conditioning mode and skips the 4.7B tower entirely."""
    snapshot_dir = Path(snapshot_dir)
    # Shape-only init: only key NAMES are consumed below, and a real init
    # would materialize the whole tree on device (for SD3's use_t5 path,
    # T5-XXL alone is ~9.5 GB — the staged-T5 single-chip mode cannot
    # afford a throwaway device copy).
    import functools

    import jax

    ref = jax.eval_shape(functools.partial(engine.init_params, seed=0))

    def find(sub):
        d = snapshot_dir / sub
        for name in ("diffusion_pytorch_model.bin", "pytorch_model.bin",
                     "diffusion_pytorch_model.safetensors", "model.safetensors"):
            if (d / name).exists():
                return load_torch_state_dict(d / name)
        raise FileNotFoundError(f"no checkpoint under {d}")

    sd1, sd2 = find("text_encoder"), find("text_encoder_2")
    extra = {}
    if getattr(engine, "t5", None) is not None:
        extra["t5"] = convert(
            find("text_encoder_3"), t5_name_map(engine.t5_config.num_layers),
            flatten(ref["t5"]).keys(), dtype)
    return {
        **extra,
        "unet": convert(find("transformer"), mmdit_name_map(engine.unet_config),
                        flatten(ref["unet"]).keys(), dtype),
        "vae": convert(
            find("vae"),
            vae_name_map(len(engine.vae_config.block_out_channels),
                         engine.vae_config.layers_per_block),
            flatten(ref["vae"]).keys(),
            dtype,
        ),
        "text": convert(sd1, clip_text_name_map(engine.text_config.num_layers),
                        flatten(ref["text"]).keys(), dtype),
        "text2": convert(sd2, clip_text_name_map(engine.text2_config.num_layers),
                         flatten(ref["text2"]).keys(), dtype),
        "text_proj": {
            "kernel": _lin(np.asarray(sd1["text_projection.weight"], np.float32)).astype(dtype)
        },
        "text2_proj": {
            "kernel": _lin(np.asarray(sd2["text_projection.weight"], np.float32)).astype(dtype)
        },
    }


def load_sdxl_checkpoint(snapshot_dir: str | Path, engine, dtype=np.float32) -> dict:
    """diffusers SDXL snapshot dir -> {unet, vae, text, text2, text2_proj}
    param tree, shaped/validated against ``engine``'s random-init tree.

    text_encoder = CLIP ViT-L, text_encoder_2 = OpenCLIP bigG with
    ``text_projection`` (CLIPTextModelWithProjection layout)."""
    snapshot_dir = Path(snapshot_dir)
    # Shape-only init: only key NAMES are consumed below, and a real init
    # would materialize the whole tree on device (for SD3's use_t5 path,
    # T5-XXL alone is ~9.5 GB — the staged-T5 single-chip mode cannot
    # afford a throwaway device copy).
    import functools

    import jax

    ref = jax.eval_shape(functools.partial(engine.init_params, seed=0))

    def find(sub):
        d = snapshot_dir / sub
        for name in ("diffusion_pytorch_model.bin", "pytorch_model.bin",
                     "diffusion_pytorch_model.safetensors", "model.safetensors"):
            if (d / name).exists():
                return load_torch_state_dict(d / name)
        raise FileNotFoundError(f"no checkpoint under {d}")

    sd2 = find("text_encoder_2")
    out = {
        "unet": convert(find("unet"), unet_name_map(engine.unet_config),
                        flatten(ref["unet"]).keys(), dtype),
        "vae": convert(
            find("vae"),
            vae_name_map(len(engine.vae_config.block_out_channels),
                         engine.vae_config.layers_per_block),
            flatten(ref["vae"]).keys(),
            dtype,
        ),
        "text": convert(find("text_encoder"), clip_text_name_map(engine.text_config.num_layers),
                        flatten(ref["text"]).keys(), dtype),
        "text2": convert(sd2, clip_text_name_map(engine.text2_config.num_layers),
                         flatten(ref["text2"]).keys(), dtype),
        "text2_proj": {
            "kernel": _lin(np.asarray(sd2["text_projection.weight"], np.float32)).astype(dtype)
        },
    }
    return out


# --------------------------------------------------------------- orbax cache
def save_params(params: dict, path: str | Path) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(Path(path).absolute(), params)


def load_params(path: str | Path) -> dict:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute())


# ------------------------------------------------------------------- LoRA
def merge_lora(
    unet_tree: dict,
    lora_sd: Dict[str, np.ndarray],
    name_map: Dict[str, Tuple[str, Transform, Transform]],
    scale: float = 1.0,
) -> dict:
    """Fuse a diffusers-format UNet LoRA into the converted param tree.

    Parity: the reference's ``load_lora_weights`` + ``fuse_lora`` path
    (consistency_model.py:20-21, LCM-LoRA).  Keys look like
    ``lora_unet_<module>_.lora_down.weight`` / ``...lora_up.weight`` or the
    peft layout ``unet.<module>.lora_A.weight`` / ``lora_B``; the merged
    delta is ``up @ down * (alpha/rank) * scale`` applied to the base torch
    tensor, then re-converted through the standard transform.
    """
    # Kohya mangling (dots -> underscores) is lossy; un-mangle by matching
    # against the known source-module names from the name map.
    def _all_srcs():
        for s, *_ in name_map.values():
            if isinstance(s, tuple):
                yield from s
            else:
                yield s

    demangle = {
        src[: -len(".weight")].replace(".", "_"): src[: -len(".weight")]
        for src in _all_srcs()
        if src.endswith(".weight")
    }

    # Collect (base_name -> (down, up, alpha)) pairs from either layout.
    pairs: Dict[str, dict] = {}
    for k, v in lora_sd.items():
        kk = k
        if kk.startswith("lora_unet_"):
            mangled = kk[len("lora_unet_"):].split(".", 1)[0]
            base = demangle.get(mangled)
            if base is None:
                continue
            part = k.rsplit(".", 2)[-2]  # lora_down / lora_up
            slot = {"lora_down": "down", "lora_up": "up"}.get(part)
        elif kk.startswith("unet."):
            stripped = kk[len("unet."):]
            if stripped.endswith(".alpha"):  # peft alpha has no .lora_ marker
                base = stripped[: -len(".alpha")]
            else:
                base = stripped.rsplit(".lora_", 1)[0]
            slot = "down" if ".lora_A." in kk else ("up" if ".lora_B." in kk else None)
        else:
            continue
        if k.endswith(".alpha"):
            pairs.setdefault(base, {})["alpha"] = float(np.asarray(v))
            continue
        if slot:
            pairs.setdefault(base, {})[slot] = np.asarray(v, np.float32)

    # Index the name map by source torch name for reverse lookup.  Fused
    # entries (tuple sources, e.g. to_qkv) map each source to a column slot
    # of the fused kernel.
    by_src = {}
    fused_by_src = {}
    for dst, (src, fwd, _) in name_map.items():
        if isinstance(src, tuple):
            for slot, s in enumerate(src):
                fused_by_src[s] = (dst, slot, len(src))
        else:
            by_src[src] = (dst, fwd)
    flat = flatten(unet_tree)
    merged = dict(flat)
    applied = 0
    for base, p in pairs.items():
        if "down" not in p or "up" not in p:
            continue
        src_name = f"{base}.weight"
        down, up = p["down"], p["up"]
        rank = down.shape[0]
        alpha = p.get("alpha", float(rank))
        if down.ndim == 4:  # conv LoRA: [r, in, kh, kw] x [out, r, 1, 1]
            delta = np.einsum("or,rikl->oikl", up[:, :, 0, 0], down)
        else:
            delta = up @ down
        delta = delta * (alpha / rank) * scale
        if src_name in by_src and by_src[src_name][0] in flat:
            dst, fwd = by_src[src_name]
            merged[dst] = (flat[dst].astype(np.float32) + fwd(delta)).astype(flat[dst].dtype)
            applied += 1
        elif src_name in fused_by_src and fused_by_src[src_name][0] in flat:
            dst, slot, k = fused_by_src[src_name]
            w = merged[dst].astype(np.float32)
            out_dim = w.shape[1] // k
            w[:, slot * out_dim:(slot + 1) * out_dim] += np.transpose(delta)
            merged[dst] = w.astype(flat[dst].dtype)
            applied += 1
    if applied == 0:
        raise KeyError("no LoRA tensors matched the UNet name map")
    return unflatten(merged)
