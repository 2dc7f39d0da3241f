"""MMDiT — the SD3-class multimodal diffusion transformer (Flax).

Beyond-reference model family (the reference lab is SD-1.5 UNet only,
``/root/reference/src/models.py:227-235``): the rectified-flow
transformer of Esser et al. 2024 ("Scaling Rectified Flow Transformers
for High-Resolution Image Synthesis"), as shipped by SD3-medium.  Two
token streams — patchified image latents and text context — each with
their own projections and AdaLN-zero modulation, attending JOINTLY (one
attention over the concatenated token axis) in every block.

TPU-first notes:
 - one architecture knob set (depth/heads/head_dim) — everything else
   static; the whole sampling run stays a single ``lax.scan`` over the
   flow plan (schedulers/flow.py) through the same engine as the UNet
   families;
 - attention goes through ``ops/attention.py``'s tiered backend, so the
   N = h*w/4 + T joint sequence rides XLA's flash fusion or the Pallas
   kernel by measured dispatch exactly like the UNet's;
 - projections use ``projection_dense`` -> int8 W8A8 (``SDBL_QUANT=int8``)
   applies to MMDiT for free (conv quant modes have no conv to hit);
 - the patchify/unpatchify are reshape/transpose only — no gathers.

Apply signature matches ``UNet2DCondition`` (latents NHWC, timesteps,
context, added_cond) so ``StableDiffusionEngine._denoise_fn`` drives it
unchanged: ``added_cond["text_embeds"]`` is the pooled conditioning
vector (SDXL reuses the same key); ``time_ids`` is accepted and ignored
(flow models carry no crop/size micro-conditioning).

Weight parity targets diffusers ``SD3Transformer2DModel`` (the public
SD3 reference implementation): parameter layout, AdaLN chunk order
(shift/scale/gate x attn/mlp), joint-attention token order (image first),
the fixed 2D sincos positional table built at ``pos_embed_max_size`` and
center-cropped to the active grid, and the exact-gelu-tanh FF.
``models/weights.py::mmdit_name_map`` maps checkpoint names.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.models.layers import (
    TimestepEmbedMLP,
    projection_dense,
    timestep_embedding,
)
from sonicdiffusionbayeslab_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    depth: int = 24
    num_heads: int = 24
    head_dim: int = 64
    joint_attention_dim: int = 4096  # context token feature dim (pre-projection)
    pooled_projection_dim: int = 2048  # pooled text vector dim
    pos_embed_max_size: int = 192  # sincos table grid (center-cropped per call)
    sample_size: int = 128  # base latent grid the table is scaled for
    time_embed_channels: int = 256  # sinusoid width before the timestep MLP
    qk_norm: bool = False  # RMSNorm on q/k (SD3.5 family)
    # Engine-compat fields (StableDiffusionEngine.sample probes these on
    # unet_config; MMDiT has neither the LCM w-embedding nor SDXL's
    # crop/size micro-conditioning):
    time_cond_proj_dim: Optional[int] = None
    addition_time_embed_dim: Optional[int] = None

    @property
    def hidden_size(self) -> int:
        return self.num_heads * self.head_dim

    @classmethod
    def sd3_medium(cls) -> "MMDiTConfig":
        """stabilityai/stable-diffusion-3-medium transformer/config.json."""
        return cls()

    @classmethod
    def tiny(cls) -> "MMDiTConfig":
        """CPU-testable geometry; same code path as sd3_medium.  Dims match
        ``SDXLTextConfigs.tiny()`` towers (16 + 16 = 32 context/pooled);
        joint_attention_dim 40 > 32 exercises the T5-width zero-pad."""
        return cls(depth=2, num_heads=2, head_dim=8, joint_attention_dim=40,
                   pooled_projection_dim=32, pos_embed_max_size=24,
                   sample_size=8, time_embed_channels=32)


def sincos_pos_embed_2d(
    embed_dim: int,
    grid_size: int,
    base_size: int,
    interpolation_scale: float = 1.0,
) -> np.ndarray:
    """[grid*grid, embed_dim] fixed table — exact diffusers
    ``get_2d_sincos_pos_embed`` sequence (meshgrid order, sin-first halves)
    so real SD3 checkpoints see identical positional codes."""
    grid_h = np.arange(grid_size, dtype=np.float64) / (grid_size / base_size) / interpolation_scale
    grid_w = np.arange(grid_size, dtype=np.float64) / (grid_size / base_size) / interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)  # w varies fastest (diffusers order)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])

    def emb_1d(dim, pos):
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64) / (dim / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate(
        [emb_1d(embed_dim // 2, grid[0]), emb_1d(embed_dim // 2, grid[1])], axis=1
    )
    return emb.astype(np.float32)  # [grid*grid, D]


def cropped_pos_embed(cfg: MMDiTConfig, h: int, w: int) -> np.ndarray:
    """Center-crop the max-size table to an h x w patch grid (diffusers
    ``PatchEmbed.cropped_pos_embed``)."""
    m = cfg.pos_embed_max_size
    if h > m or w > m:
        raise ValueError(f"latent grid {h}x{w} exceeds pos_embed_max_size {m}")
    table = sincos_pos_embed_2d(cfg.hidden_size, m, cfg.sample_size // cfg.patch_size)
    top, left = (m - h) // 2, (m - w) // 2
    return table.reshape(m, m, -1)[top:top + h, left:left + w].reshape(h * w, -1)


class AdaLNZero(nn.Module):
    """silu(c) -> Dense(n_chunks * hidden); returns the chunk tuple.

    Chunk order is diffusers ``AdaLayerNormZero``:
    (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp),
    or (scale, shift) for the 2-chunk continuous variant (``norm_out`` /
    the final block's context stream)."""

    n_chunks: int
    hidden: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c: jax.Array) -> Tuple[jax.Array, ...]:
        h = nn.Dense(self.n_chunks * self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear")(nn.silu(c))
        return tuple(jnp.split(h, self.n_chunks, axis=-1))


def _modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class GELUTanhFeedForward(nn.Module):
    """Dense(4x) -> gelu(tanh) -> Dense (diffusers FeedForward
    activation_fn='gelu-approximate', SD3's MLP — NOT the UNet's GEGLU)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = projection_dense(self.dim * 4, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="proj_in")(x)
        h = nn.gelu(h, approximate=True)
        return projection_dense(self.dim, dtype=self.dtype,
                                param_dtype=self.param_dtype, name="proj_out")(h)


class MMDiTBlock(nn.Module):
    """One joint block: per-stream AdaLN-zero -> joint attention over
    [image tokens ++ context tokens] -> per-stream gated residual + MLP.

    ``context_pre_only`` (final block): the context stream still feeds
    k/v into the joint attention but receives no update (2-chunk AdaLN,
    no out projection / MLP) — diffusers JointTransformerBlock semantics."""

    config: MMDiTConfig
    context_pre_only: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, ctx: jax.Array, c: jax.Array,
                 tome=None, tome_hw=None, tome_key=None, tome_cache=None):
        cfg = self.config
        H, D = cfg.num_heads, cfg.head_dim
        inner = H * D
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)

        i_mod = AdaLNZero(6, inner, name="norm1", **kw)(c)
        if self.context_pre_only:
            c_scale, c_shift = AdaLNZero(2, inner, name="norm1_context", **kw)(c)
        else:
            c_mod = AdaLNZero(6, inner, name="norm1_context", **kw)(c)

        img_n = _modulate(ln("norm1_ln")(img), i_mod[0], i_mod[1])
        if self.context_pre_only:
            ctx_n = _modulate(ln("norm1_context_ln")(ctx), c_shift, c_scale)
        else:
            ctx_n = _modulate(ln("norm1_context_ln")(ctx), c_mod[0], c_mod[1])

        dense = lambda name: projection_dense(inner, **kw, name=name)  # noqa: E731
        B, N = img.shape[0], img.shape[1]
        T = ctx.shape[1]

        # DiT-ToMe (ops/tome.py, APPROXIMATE): merge the most redundant
        # IMAGE tokens around the joint attention — q/k/v/o projections and
        # the (N+T)^2 attention run at N-r image tokens; the text stream is
        # NEVER merged, so the ToMeSD unmerge stays well-defined (sources
        # copy their destination's post-attention row; context rows pass
        # through untouched).  Matching is built on the block INPUT image
        # stream (the paper's metric choice, same as the UNet hook in
        # models/layers.py) and shared across blocks via tome_cache.
        merge = unmerge = None
        if tome is not None:
            from sonicdiffusionbayeslab_tpu.ops.tome import (
                bipartite_soft_matching_2d,
            )

            if tome.share and tome_cache is not None:
                for (chh, cww, cb), mu in tome_cache.items():
                    if (chh, cww) == tome_hw and B % cb == 0:
                        merge, unmerge = mu
                        break
            if merge is None:
                merge, unmerge = bipartite_soft_matching_2d(
                    img, tome_hw[0], tome_hw[1], tome, tome_key)
                if tome.share and tome_cache is not None:
                    tome_cache[(tome_hw[0], tome_hw[1], B)] = (merge, unmerge)

        def heads(x):
            return x.reshape(B, x.shape[1], H, D)

        # Joint attention: image tokens FIRST (diffusers JointAttnProcessor).
        # qk_norm (SD3.5 family): per-head RMSNorm over D, with SEPARATE
        # learned scales for the image (norm_q/norm_k) and context
        # (norm_added_q/norm_added_k) streams, applied pre-concat.
        def rms(name):
            return nn.RMSNorm(epsilon=1e-6, dtype=self.dtype,
                              param_dtype=self.param_dtype, name=name)

        img_a = merge(img_n) if merge is not None else img_n
        Nm = img_a.shape[1]
        q_i, q_c = heads(dense("to_q")(img_a)), heads(dense("add_q_proj")(ctx_n))
        k_i, k_c = heads(dense("to_k")(img_a)), heads(dense("add_k_proj")(ctx_n))
        if cfg.qk_norm:
            q_i, k_i = rms("norm_q")(q_i), rms("norm_k")(k_i)
            q_c, k_c = rms("norm_added_q")(q_c), rms("norm_added_k")(k_c)
        q = jnp.concatenate([q_i, q_c], axis=1)
        k = jnp.concatenate([k_i, k_c], axis=1)
        v = jnp.concatenate([heads(dense("to_v")(img_a)), heads(dense("add_v_proj")(ctx_n))], axis=1)
        o = dot_product_attention(q, k, v).reshape(B, Nm + T, inner)
        o_img, o_ctx = o[:, :Nm], o[:, Nm:]

        o_img = dense("to_out")(o_img)
        if unmerge is not None:
            o_img = unmerge(o_img)
        img = img + i_mod[2][:, None, :] * o_img
        img_m = _modulate(ln("norm2_ln")(img), i_mod[3], i_mod[4])
        img = img + i_mod[5][:, None, :] * GELUTanhFeedForward(
            inner, **kw, name="ff")(img_m)

        if self.context_pre_only:
            return img, None
        ctx = ctx + c_mod[2][:, None, :] * dense("to_add_out")(o_ctx)
        ctx_m = _modulate(ln("norm2_context_ln")(ctx), c_mod[3], c_mod[4])
        ctx = ctx + c_mod[5][:, None, :] * GELUTanhFeedForward(
            inner, **kw, name="ff_context")(ctx_m)
        return img, ctx


class MMDiT(nn.Module):
    """Full transformer.  NHWC latents in, velocity prediction out."""

    config: MMDiTConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # [B, h, w, C]
        timesteps: jax.Array,  # [B] (sigma * num_train_timesteps)
        context: jax.Array,  # [B, T, joint_attention_dim]
        added_cond: Optional[dict] = None,  # {"text_embeds": pooled[, "time_ids": ignored]}
        *,
        tome=None,
        timestep_cond: Optional[jax.Array] = None,
        # DeepCache for the DiT family (trunk-delta caching): the engine's
        # CachePlan machinery drives these exactly like the UNet's
        # (sampler.py full/cached lax.cond branches; reference product:
        # /root/reference/src/experiments/deep_cache.py:23-29).  The block
        # stack splits at depth b = cache_branch_id: blocks 0..b-1
        # ("shallow") always run fresh; the deep trunk's cumulative
        # RESIDUAL delta (x_out - x_b, one [B, N, hidden] tensor) is
        # recorded on full steps and replayed on cached steps — the DiT
        # analog of replaying the U-Net's deep features across a skip
        # (per-block variant: FORA, Selvaraju et al. 2024; delta form:
        # Delta-DiT, Chen et al. 2024).  AdaLN modulation (timestep +
        # pooled conditioning) and the final norm_out stay fresh on every
        # step.
        cache: Optional[jax.Array] = None,  # [B, N_patches, hidden] trunk delta
        return_cache: bool = False,
        cache_branch_id: int = 0,  # static: # of always-fresh leading blocks
        # No **kwargs catch-all: unsupported engine features (ControlNet
        # residuals, IP-Adapter tokens) must fail loudly at trace time,
        # not be silently swallowed.
    ) -> jax.Array:
        cfg = self.config
        if timestep_cond is not None:
            raise NotImplementedError("MMDiT has no w-embedding conditioning")
        if added_cond is None or "text_embeds" not in added_cond:
            raise ValueError(
                "MMDiT requires added_cond with 'text_embeds': the pooled "
                f"[B, {cfg.pooled_projection_dim}] SD3 conditioning vector")
        pooled = added_cond["text_embeds"]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        B, h, w, C = latents.shape
        p = cfg.patch_size
        if h % p or w % p:
            raise ValueError(f"latent grid {h}x{w} not divisible by patch {p}")
        hp, wp = h // p, w // p

        # Patchify: [B, hp*wp, p*p*C] (row-major within each patch, matching
        # the transposed-conv layout diffusers' Conv2d(patch, stride=patch)
        # produces once folded to a matmul — see mmdit_name_map).
        x = latents.astype(self.dtype).reshape(B, hp, p, wp, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp * wp, p * p * C)
        x = projection_dense(cfg.hidden_size, **kw, name="patch_proj")(x)
        pos = jnp.asarray(cropped_pos_embed(cfg, hp, wp), self.dtype)
        x = x + pos[None]

        # Conditioning vector c = MLP(sinusoid(t)) + MLP(pooled).
        t_emb = timestep_embedding(timesteps, cfg.time_embed_channels)
        c = TimestepEmbedMLP(cfg.hidden_size, **kw, name="timestep_embedder")(
            t_emb.astype(self.dtype))
        c = c + TimestepEmbedMLP(cfg.hidden_size, **kw, name="text_embedder")(
            pooled.astype(self.dtype))

        ctx = context.astype(self.dtype)
        if ctx.shape[-1] != cfg.joint_attention_dim:
            raise ValueError(
                f"context dim {ctx.shape[-1]} != joint_attention_dim "
                f"{cfg.joint_attention_dim} (pad as the pipeline does)")
        ctx = nn.Dense(cfg.hidden_size, **kw, name="context_embedder")(ctx)

        # DiT-ToMe (see MMDiTBlock): the patch grid hp x wp is the 2D token
        # map for the strided destination partition.  One matching per step
        # (built on block 0's input image stream) shared across all blocks
        # when tome.share; the per-step key derives from the timestep so it
        # varies inside the sampling scan without extra plumbing (same
        # recipe as models/unet.py's hook).
        if tome is not None and (hp % tome.sy or wp % tome.sx):
            tome = None  # partition undefined for this patch grid; skip
        tome_cache = {}
        tome_step_key = None
        if tome is not None and tome.rand:
            tome_step_key = jax.random.fold_in(
                jax.random.PRNGKey(0x703E), timesteps[0].astype(jnp.int32))

        def tome_kw(i):
            if tome is None:
                return {}
            bkey = (jax.random.fold_in(tome_step_key, i)
                    if tome_step_key is not None else None)
            return dict(tome=tome, tome_hw=(hp, wp), tome_key=bkey,
                        tome_cache=tome_cache)

        branch = int(cache_branch_id)
        if (cache is not None or return_cache) and not 0 <= branch < cfg.depth:
            raise ValueError(
                f"cache_branch_id {branch} out of range [0, {cfg.depth}) "
                f"(number of always-fresh leading blocks)")
        if cache is not None and return_cache:
            raise ValueError("cache= and return_cache are exclusive (a step "
                             "either replays the trunk or records it)")

        def block(i):
            return MMDiTBlock(cfg, context_pre_only=(i == cfg.depth - 1),
                              name=f"blocks_{i}", **kw)

        if cache is not None:
            # Cached step: only the shallow blocks run; the deep trunk's
            # recorded residual delta is replayed on top of their output.
            for i in range(branch):
                x, ctx = block(i)(x, ctx, c, **tome_kw(i))
            x = x + cache.astype(self.dtype)
        else:
            x_b = x
            for i in range(cfg.depth):
                if i == branch:
                    x_b = x
                x, ctx = block(i)(x, ctx, c, **tome_kw(i))
            trunk_delta = x - x_b

        scale, shift = AdaLNZero(2, cfg.hidden_size, name="norm_out", **kw)(c)
        x = _modulate(
            nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm_out_ln")(x),
            shift, scale,
        )
        x = projection_dense(p * p * cfg.out_channels, **kw, name="proj_out")(x)

        # Unpatchify back to NHWC velocity.
        x = x.reshape(B, hp, wp, p, p, cfg.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, h, w, cfg.out_channels)
        if return_cache:
            return x, trunk_delta
        return x

    def cache_shape(self, height: int, width: int, cache_branch_id: int = 0):
        """Shape of the trunk-delta cache for a [*, height, width, *]
        latent: one hidden-width vector per image patch token (the split
        depth does not change the shape — the delta always lives on the
        image stream at full token resolution)."""
        p = self.config.patch_size
        return ((height // p) * (width // p), self.config.hidden_size)
