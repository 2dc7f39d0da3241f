"""Independent NumPy reimplementation of the Stable-Diffusion block math.

Written from the architecture definition (Rombach et al. 2022 latent
diffusion; the diffusers module conventions the reference drives at
src/models.py:227-235 and :288-292) — NOT from the Flax code — to serve as
golden oracles for tests/test_golden_blocks.py.  Everything is plain fp32
numpy with naive loops/im2col: slow, obvious, and independent of XLA.

Conventions under test (each is a silent-corruption risk in the Flax side):
- conv kernels are HWIO; a transposed kernel shifts every feature map
- GroupNorm groups CONTIGUOUS channel blocks (c // (C/G)), biased variance
- attention is per-head with 1/sqrt(D) scaling and fp32 softmax
- GEGLU gates with EXACT erf gelu (torch F.gelu default)
- the VAE encoder downsample pads right/bottom only (diffusers (0,1,0,1))
- timestep embedding is [cos | sin] with freqs 10000^(-i/half)
"""

from __future__ import annotations

import math

import numpy as np


def conv2d(x, kernel, bias=None, stride=1, pad=((1, 1), (1, 1))):
    """x [B,H,W,Cin], kernel [kh,kw,Cin,Cout] (HWIO), explicit padding."""
    B, H, W, Ci = x.shape
    kh, kw, Ci2, Co = kernel.shape
    assert Ci == Ci2, (Ci, Ci2)
    xp = np.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    Ho = (xp.shape[1] - kh) // stride + 1
    Wo = (xp.shape[2] - kw) // stride + 1
    # im2col: [B, Ho, Wo, kh*kw*Ci]
    cols = np.empty((B, Ho, Wo, kh * kw * Ci), np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, i:i + Ho * stride:stride, j:j + Wo * stride:stride, :]
            cols[..., (i * kw + j) * Ci:(i * kw + j) * Ci + Ci] = patch
    w = kernel.transpose(0, 1, 2, 3).reshape(kh * kw * Ci, Co)
    out = cols.reshape(-1, kh * kw * Ci) @ w
    out = out.reshape(B, Ho, Wo, Co)
    if bias is not None:
        out = out + bias
    return out.astype(np.float32)


def dense(x, kernel, bias=None):
    out = x @ kernel
    if bias is not None:
        out = out + bias
    return out.astype(np.float32)


def silu(x):
    return x / (1.0 + np.exp(-x))


def gelu_exact(x):
    return 0.5 * x * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))


def group_norm(x, scale, bias, groups=32, eps=1e-5, apply_silu=False):
    """x [..., C]: stats over all non-batch axes within each contiguous
    channel group (torch nn.GroupNorm semantics, biased variance)."""
    shape = x.shape
    C = shape[-1]
    g = groups if C % groups == 0 else math.gcd(C, groups)
    xg = x.reshape(shape[0], -1, g, C // g)  # [B, spatial, G, C/G]
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xg = (xg - mean) / np.sqrt(var + eps)
    out = xg.reshape(shape) * scale + bias
    if apply_silu:
        out = silu(out)
    return out.astype(np.float32)


def layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return ((x - mean) / np.sqrt(var + eps) * scale + bias).astype(np.float32)


def softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def attention(q, k, v, num_heads):
    """q [B,N,E], k/v [B,M,E] (already projected): per-head scaled dot
    product, heads = contiguous E/num_heads slices."""
    B, N, E = q.shape
    M = k.shape[1]
    D = E // num_heads
    out = np.empty((B, N, E), np.float32)
    for h in range(num_heads):
        sl = slice(h * D, (h + 1) * D)
        s = np.einsum("bnd,bmd->bnm", q[:, :, sl], k[:, :, sl]) / math.sqrt(D)
        p = softmax(s, axis=-1)
        out[:, :, sl] = np.einsum("bnm,bmd->bnd", p, v[:, :, sl])
    return out


def attention_block(x, p, num_heads):
    """Full Attention module: to_q/k/v (no bias) + to_out, given param tree p
    (flax naming: p['to_q']['kernel'] etc.), self-attention."""
    q = dense(x, p["to_q"]["kernel"])
    k = dense(x, p["to_k"]["kernel"])
    v = dense(x, p["to_v"]["kernel"])
    o = attention(q, k, v, num_heads)
    return dense(o, p["to_out"]["kernel"], p["to_out"].get("bias"))


def cross_attention_block(x, ctx, p, num_heads):
    q = dense(x, p["to_q"]["kernel"])
    k = dense(ctx, p["to_k"]["kernel"])
    v = dense(ctx, p["to_v"]["kernel"])
    o = attention(q, k, v, num_heads)
    return dense(o, p["to_out"]["kernel"], p["to_out"].get("bias"))


def timestep_embedding(t, dim, max_period=10000.0):
    """[B] -> [B, dim]: freqs 10000^(-i/half), concat [cos | sin]
    (diffusers Timesteps with flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    freqs = np.exp(-math.log(max_period) * np.arange(half, dtype=np.float64) / half)
    args = np.asarray(t, np.float64)[:, None] * freqs[None, :]
    emb = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    if dim % 2:
        emb = np.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(np.float32)


def resnet_block(x, t_emb, p, eps=1e-5):
    """GN-SiLU-conv3x3 -> +time proj -> GN-SiLU-conv3x3 -> +skip (1x1 if
    channel change). p: flax param subtree of ResnetBlock."""
    h = group_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], eps=eps, apply_silu=True)
    h = conv2d(h, p["conv1"]["kernel"], p["conv1"]["bias"])
    if t_emb is not None:
        t = dense(silu(t_emb), p["time_emb_proj"]["kernel"], p["time_emb_proj"]["bias"])
        h = h + t[:, None, None, :]
    h = group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"], eps=eps, apply_silu=True)
    h = conv2d(h, p["conv2"]["kernel"], p["conv2"]["bias"])
    if "conv_shortcut" in p:
        x = conv2d(x, p["conv_shortcut"]["kernel"], p["conv_shortcut"]["bias"],
                   pad=((0, 0), (0, 0)))
    return x + h


def geglu_ff(x, p):
    h = dense(x, p["proj_in"]["kernel"], p["proj_in"]["bias"])
    h, gate = np.split(h, 2, axis=-1)
    h = h * gelu_exact(gate)
    return dense(h, p["proj_out"]["kernel"], p["proj_out"]["bias"])


def transformer_block(x, ctx, p, num_heads):
    """Pre-norm: x += attn1(LN(x)); x += attn2(LN(x), ctx); x += FF(LN(x))."""
    h = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"])
    x = x + attention_block(h, p["attn1"], num_heads)
    h = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"])
    x = x + cross_attention_block(h, ctx, p["attn2"], num_heads)
    h = layer_norm(x, p["norm3"]["scale"], p["norm3"]["bias"])
    return x + geglu_ff(h, p["ff"])


def spatial_transformer(x, ctx, p, num_heads, depth=1):
    """GN(eps 1e-6) -> flatten -> proj_in -> blocks -> proj_out -> +residual."""
    B, H, W, C = x.shape
    h = group_norm(x, p["norm"]["scale"], p["norm"]["bias"], eps=1e-6)
    h = h.reshape(B, H * W, C)
    h = dense(h, p["proj_in"]["kernel"], p["proj_in"]["bias"])
    for i in range(depth):
        h = transformer_block(h, ctx, p[f"block_{i}"], num_heads)
    h = dense(h, p["proj_out"]["kernel"], p["proj_out"]["bias"])
    return h.reshape(B, H, W, C) + x


def attn_block_2d(x, p, num_heads=1):
    """VAE mid attention: GN(1e-6) -> flatten -> self-attn -> +residual."""
    B, H, W, C = x.shape
    h = group_norm(x, p["norm"]["scale"], p["norm"]["bias"], eps=1e-6)
    h = attention_block(h.reshape(B, H * W, C), p["attn"], num_heads)
    return x + h.reshape(B, H, W, C)


def upsample(x, p):
    """Nearest 2x then conv3x3."""
    B, H, W, C = x.shape
    up = np.repeat(np.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(up, p["conv"]["kernel"], p["conv"]["bias"])


def downsample_vae(x, p):
    """SD VAE encoder convention: pad right/bottom only, stride-2 conv."""
    return conv2d(x, p["conv"]["kernel"], p["conv"]["bias"], stride=2,
                  pad=((0, 1), (0, 1)))


def downsample_unet(x, p):
    """UNet convention: symmetric padding=1, stride-2 conv."""
    return conv2d(x, p["conv"]["kernel"], p["conv"]["bias"], stride=2,
                  pad=((1, 1), (1, 1)))


def vae_decoder(z, p, cfg_channels, layers_per_block, out_channels):
    """Full SD VAE decoder: conv_in -> mid(res, attn, res) ->
    up blocks (layers+1 resnets each, upsample between) -> GN-SiLU -> conv_out."""
    h = conv2d(z, p["conv_in"]["kernel"], p["conv_in"]["bias"])
    h = resnet_block(h, None, p["mid_res_0"], eps=1e-6)
    h = attn_block_2d(h, p["mid_attn"])
    h = resnet_block(h, None, p["mid_res_1"], eps=1e-6)
    n = len(cfg_channels)
    for i, _ch in enumerate(reversed(cfg_channels)):
        for j in range(layers_per_block + 1):
            h = resnet_block(h, None, p[f"up_{i}_res_{j}"], eps=1e-6)
        if i < n - 1:
            h = upsample(h, p[f"up_{i}_upsample"])
    h = group_norm(h, p["norm_out"]["scale"], p["norm_out"]["bias"], eps=1e-6,
                   apply_silu=True)
    return conv2d(h, p["conv_out"]["kernel"], p["conv_out"]["bias"])
