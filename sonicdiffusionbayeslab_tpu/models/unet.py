"""UNet2DCondition in Flax (SD-1.5 geometry), NHWC / bf16-ready.

TPU-native replacement for the diffusers ``UNet2DConditionModel`` the
reference drives from its denoising loops (src/models.py:227-235) — same
architecture family (Rombach et al. LDM UNet: resnet blocks + spatial
transformers with cross-attention to CLIP text states), re-written for XLA:
static shapes, NHWC, fp32 norm statistics, attention routed through the
swappable ops backend.

The per-block *deep-feature cache* hooks (``cache`` / ``return_cached``
arguments of ``__call__``) are the static-structure re-expression of
DeepCache (reference: DeepCacheSDHelper forward-hook monkey-patching,
src/experiments/deep_cache.py:23-29): the caller compiles two variants of
the same module — one that returns the deep trunk's features, one that
consumes them and only runs the shallowest branch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sonicdiffusionbayeslab_tpu.models.layers import (
    Downsample,
    GroupNorm,
    ResnetBlock,
    SpatialTransformer,
    TimestepEmbedMLP,
    Upsample,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD-1.5 defaults (runwayml/stable-diffusion-v1-5 unet/config.json).

    ``transformer_depth`` and ``num_attention_heads`` accept either a scalar
    (same at every level — SD-1.5) or a per-level tuple (SDXL:
    transformer_layers_per_block=[1,2,10], num_attention_heads=[5,10,20]).

    SDXL's text_time micro-conditioning (addition_embed_type="text_time"):
    ``addition_time_embed_dim`` sinusoidally embeds each of the 6 time_ids,
    the result concats with the pooled text embedding into a
    ``projection_class_embeddings_input_dim``-wide vector fed through
    add_embedding and ADDED to the timestep embedding.
    """

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention: Tuple[bool, ...] = (True, True, True, False)
    transformer_depth: int | Tuple[int, ...] = 1
    num_attention_heads: int | Tuple[int, ...] = 8
    cross_attention_dim: int = 768
    freq_shift: float = 0.0  # unused placeholder for parity with HF config
    # SDXL text_time additional conditioning (None = SD-1.5: absent).
    addition_time_embed_dim: Optional[int] = None
    projection_class_embeddings_input_dim: Optional[int] = None
    # diffusers use_linear_projection (SD-2.x / SDXL transformer proj_in/out
    # are nn.Linear, SD-1.5's are 1x1 convs). The compute is identical in
    # NHWC; the flag only drives the weight converter's source layout.
    # None = infer from addition_time_embed_dim (SDXL).
    use_linear_projection: Optional[bool] = None
    # diffusers time_cond_proj_dim: guidance(w)-embedding conditioning of the
    # timestep MLP — full LCM checkpoints (e.g. LCM_Dreamshaper_v7, 256).
    time_cond_proj_dim: Optional[int] = None

    @property
    def linear_projection(self) -> bool:
        if self.use_linear_projection is not None:
            return bool(self.use_linear_projection)
        return self.addition_time_embed_dim is not None

    def depth_at(self, lvl: int) -> int:
        d = self.transformer_depth
        return int(d[lvl]) if isinstance(d, (tuple, list)) else int(d)

    def heads_at(self, lvl: int) -> int:
        h = self.num_attention_heads
        return int(h[lvl]) if isinstance(h, (tuple, list)) else int(h)

    @classmethod
    def tiny(cls) -> "UNetConfig":
        """2-level random-weight UNet for CPU tests (SURVEY §4 integration)."""
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention=(True, False),
            num_attention_heads=2,
            cross_attention_dim=32,
        )

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls()

    @classmethod
    def sd21(cls) -> "UNetConfig":
        """stabilityai/stable-diffusion-2-1 unet/config.json: SD-1.5 topology
        with 64-wide heads per level (attention_head_dim=[5,10,20,20]),
        OpenCLIP ViT-H context (1024) and linear transformer projections."""
        return cls(
            num_attention_heads=(5, 10, 20, 20),
            cross_attention_dim=1024,
            use_linear_projection=True,
        )

    @classmethod
    def tiny21(cls) -> "UNetConfig":
        """2-level SD-2.x-shaped UNet (linear proj, no added cond)."""
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention=(True, False),
            num_attention_heads=(2, 4),
            cross_attention_dim=32,
            use_linear_projection=True,
        )

    @classmethod
    def sdxl(cls) -> "UNetConfig":
        """stabilityai/stable-diffusion-xl-base-1.0 unet/config.json."""
        return cls(
            block_out_channels=(320, 640, 1280),
            layers_per_block=2,
            cross_attention=(False, True, True),
            transformer_depth=(1, 2, 10),
            num_attention_heads=(5, 10, 20),
            cross_attention_dim=2048,
            addition_time_embed_dim=256,
            projection_class_embeddings_input_dim=2816,  # 1280 pooled + 6*256
        )

    @classmethod
    def tiny_xl(cls) -> "UNetConfig":
        """2-level SDXL-shaped UNet (per-level depth/heads + text_time cond)."""
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention=(False, True),
            transformer_depth=(1, 2),
            num_attention_heads=(2, 4),
            cross_attention_dim=32,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=16 + 6 * 8,  # pooled 16 + ids
        )


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # [B, H, W, C_in]
        timesteps: jax.Array,  # [B] or scalar
        encoder_hidden_states: jax.Array,  # [B, T, cross_attention_dim]
        added_cond: Optional[dict] = None,  # SDXL text_time: {text_embeds, time_ids}
        cache: Optional[jax.Array] = None,  # deep-feature injection (DeepCache)
        return_cache: bool = False,  # also return the deep trunk's features
        cache_branch_id: int = 0,  # static: depth of the shallow/trunk split
        # ControlNet residuals: (down: tuple aligned with the skip states,
        # mid: array added after the mid block) — models/controlnet.py.
        control_residuals: Optional[Tuple] = None,
        # IP-Adapter image-prompt tokens [B, P, cross_attention_dim]
        # (models/ip_adapter.py); every cross-attention gains decoupled
        # to_k_ip/to_v_ip projections when present.
        ip_context: Optional[jax.Array] = None,
        ip_scale=1.0,
        # Guidance-embedding conditioning [B, time_cond_proj_dim] (full LCM
        # models; see guidance_scale_embedding in models/sampler.py).
        timestep_cond: Optional[jax.Array] = None,
        # CFG shared prefix (docs/PERF.md): sample/timesteps arrive as the
        # SINGLE latent copy [B] while encoder_hidden_states is the
        # CFG-doubled [neg|pos] [2B].  The two CFG halves are bit-identical
        # until the first cross-attention (same latents, same timestep), so
        # conv_in, the leading resnets and the first self-attention run once
        # at B and the activations tile to 2B where the contexts diverge.
        # Output is [2B, ...] as usual.  Static flag: its own compiled
        # program.
        cfg_shared_prefix: bool = False,
        # Token Merging (ops/tome.py TomeConfig, static/hashable): merge the
        # most redundant tokens around every self-attention at levels whose
        # downsample factor is <= tome.max_downsample.  Approximate method
        # (paper-quantified quality delta), same family as DeepCache.
        tome=None,
    ):
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        if cfg.time_cond_proj_dim is not None and timestep_cond is None:
            raise ValueError(
                "this UNet config requires timestep_cond (guidance embedding, "
                f"dim {cfg.time_cond_proj_dim})"
            )
        t_emb = TimestepEmbedMLP(cfg.block_out_channels[0] * 4, name="time_embedding", **kw)(
            t_emb.astype(self.dtype),
            cond=timestep_cond if cfg.time_cond_proj_dim is not None else None,
        )
        if cfg.addition_time_embed_dim is not None:
            # SDXL text_time micro-conditioning (diffusers addition_embed_type
            # "text_time"): sinusoid each time_id, concat with the pooled text
            # embedding, project through add_embedding, add to the time emb.
            if added_cond is None:
                raise ValueError(
                    "this UNet config requires added_cond={'text_embeds', 'time_ids'}"
                )
            ids = added_cond["time_ids"].astype(jnp.float32)
            B, K = ids.shape
            id_emb = timestep_embedding(ids.reshape(-1), cfg.addition_time_embed_dim)
            id_emb = id_emb.reshape(B, K * cfg.addition_time_embed_dim)
            add_in = jnp.concatenate(
                [added_cond["text_embeds"].astype(jnp.float32), id_emb], axis=-1
            )
            want = cfg.projection_class_embeddings_input_dim
            if want is not None and add_in.shape[-1] != want:
                raise ValueError(
                    f"added_cond width {add_in.shape[-1]} != "
                    f"projection_class_embeddings_input_dim {want}"
                )
            t_emb = t_emb + TimestepEmbedMLP(
                cfg.block_out_channels[0] * 4, name="add_embedding", **kw
            )(add_in.astype(self.dtype))
        ctx = encoder_hidden_states.astype(self.dtype)

        if cfg_shared_prefix:
            if (added_cond is not None or ip_context is not None
                    or cache is not None or return_cache
                    or control_residuals is not None or timestep_cond is not None):
                raise ValueError(
                    "cfg_shared_prefix composes with the plain UNet path only "
                    "(no SDXL added_cond / IP-Adapter / DeepCache / ControlNet "
                    "/ timestep_cond)"
                )
            if ctx.shape[0] != 2 * sample.shape[0]:
                raise ValueError(
                    f"cfg_shared_prefix expects context batch "
                    f"{ctx.shape[0]} == 2 x sample batch {sample.shape[0]}"
                )

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, name="conv_in", **kw)(
            sample.astype(self.dtype)
        )

        # CFG shared prefix: before the tile point activations are [B] while
        # the time embedding / early skips stay [B]; after it everything is
        # [2B].  These helpers tile the [B]-sized operands exactly where a
        # [2B] activation meets them (no-ops when the flag is off).
        def temb_for(hh, te):
            if hh.shape[0] == 2 * te.shape[0]:
                return jnp.concatenate([te, te], axis=0)
            return te

        def skip_for(hh, s):
            if hh.shape[0] == 2 * s.shape[0]:
                return jnp.concatenate([s, s], axis=0)
            return s

        def res(ch, name):
            m = ResnetBlock(ch, name=name, **kw)
            return lambda hh, te: m(hh, temb_for(hh, te))

        ip_ctx = ip_context.astype(self.dtype) if ip_context is not None else None
        _pfx = {"pending": bool(cfg_shared_prefix)}

        # ToMe: one key per diffusion step (derived from the timestep, so it
        # varies inside the sampling scan without extra plumbing), folded per
        # transformer site so each picks its own in-cell destinations.
        # tome_cache shares one matching per (H, W, B) across this call's
        # sites when tome.share (ops/tome.py — the measured v5e default).
        _tome_site = {"n": 0}
        tome_cache = {}
        tome_step_key = None
        if tome is not None and tome.rand:
            tome_step_key = jax.random.fold_in(
                jax.random.PRNGKey(0x703E), timesteps[0].astype(jnp.int32)
            )

        def xfmr(ch, name, lvl):
            heads = cfg.heads_at(lvl)
            tile_here = _pfx["pending"]
            _pfx["pending"] = False
            site_tome, site_key = None, None
            if tome is not None and (1 << lvl) <= tome.max_downsample:
                site_tome = tome
                if tome_step_key is not None:
                    site_key = jax.random.fold_in(tome_step_key, _tome_site["n"])
                _tome_site["n"] += 1
            m = SpatialTransformer(
                heads,
                ch // heads,
                depth=cfg.depth_at(lvl),
                cfg_tile=tile_here,
                name=name,
                **kw,
            )
            return lambda h, c: m(h, c, ip_context=ip_ctx, ip_scale=ip_scale,
                                  tome=site_tome, tome_key=site_key,
                                  tome_cache=tome_cache)

        n_levels = len(cfg.block_out_channels)
        # DeepCache split (reference deep_cache.py:25-27, generalized to any
        # branch): the shallow branch = down levels 0..b + up levels b..0
        # where b = cache_branch_id; everything deeper (down levels b+1..,
        # mid, up levels ..b+1) is the trunk whose output feature map is
        # cached/replayed between steps.  On a cached step only the shallow
        # branch executes.  b is static, so each (b, cached-ness) pair is its
        # own compiled program — exactly two per sweep point.
        deep = cache is None
        branch = int(cache_branch_id)
        if not 0 <= branch < n_levels:
            raise ValueError(f"cache_branch_id {branch} out of range [0, {n_levels})")
        if control_residuals is not None and not deep:
            # A cached step skips the deep levels whose skips the control
            # residuals align with; the combination is ill-defined.
            raise ValueError("control_residuals cannot be combined with a DeepCache step")

        # ---- down stack; skips collected for the up stack ------------------
        skips = [h]
        for lvl, ch in enumerate(cfg.block_out_channels):
            if lvl > branch and not deep:
                break
            for j in range(cfg.layers_per_block):
                h = res(ch, f"down_{lvl}_res_{j}")(h, t_emb)
                if cfg.cross_attention[lvl]:
                    h = xfmr(ch, f"down_{lvl}_attn_{j}", lvl)(h, ctx)
                skips.append(h)
            # Level b's downsample feeds (and its skip is consumed by) the
            # trunk only, so the shallow pass stops before it.
            if lvl < n_levels - 1 and (deep or lvl < branch):
                h = Downsample(ch, name=f"down_{lvl}_downsample", allow_quant=True, **kw)(h)
                skips.append(h)

        if control_residuals is not None:
            # ControlNet injection (diffusers UNet's
            # down_block_additional_residuals / mid_block_additional_residual):
            # each saved skip state gets its residual; the mid one lands
            # after the mid block below.
            down_r, mid_r = control_residuals
            if len(down_r) != len(skips):
                raise ValueError(
                    f"{len(down_r)} control residuals != {len(skips)} skip states"
                )
            skips = [s + r.astype(s.dtype) for s, r in zip(skips, down_r)]

        if deep:
            # ---- mid -----------------------------------------------------
            mid_ch = cfg.block_out_channels[-1]
            h = res(mid_ch, "mid_res_0")(h, t_emb)
            h = xfmr(mid_ch, "mid_attn", n_levels - 1)(h, ctx)
            h = res(mid_ch, "mid_res_1")(h, t_emb)
            if control_residuals is not None:
                h = h + mid_r.astype(h.dtype)

            # ---- up stack through the deep levels ------------------------
            for lvl in reversed(range(branch + 1, n_levels)):
                ch = cfg.block_out_channels[lvl]
                for j in range(cfg.layers_per_block + 1):
                    skip = skip_for(h, skips.pop())
                    h = res(ch, f"up_{lvl}_res_{j}")(jnp.concatenate([h, skip], axis=-1), t_emb)
                    if cfg.cross_attention[lvl]:
                        h = xfmr(ch, f"up_{lvl}_attn_{j}", lvl)(h, ctx)
                h = Upsample(ch, name=f"up_{lvl}_upsample", allow_quant=True, **kw)(h)
            deep_features = h
        else:
            deep_features = cache.astype(self.dtype)
            h = deep_features

        # ---- shallow up levels branch..0 (always executed) ------------------
        for lvl in reversed(range(branch + 1)):
            ch = cfg.block_out_channels[lvl]
            for j in range(cfg.layers_per_block + 1):
                skip = skip_for(h, skips.pop())
                h = res(ch, f"up_{lvl}_res_{j}")(jnp.concatenate([h, skip], axis=-1), t_emb)
                if cfg.cross_attention[lvl]:
                    h = xfmr(ch, f"up_{lvl}_attn_{j}", lvl)(h, ctx)
            if lvl > 0:
                h = Upsample(ch, name=f"up_{lvl}_upsample", allow_quant=True, **kw)(h)

        h = GroupNorm(silu=True, name="conv_norm_out", **kw)(h)
        out = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", **kw)(h)
        out = out.astype(jnp.float32)
        if return_cache:
            return out, deep_features
        return out

    def cache_shape(self, height: int, width: int, cache_branch_id: int = 0):
        """Shape of the deep-feature cache for a [*, height, width, *] sample.

        The trunk output consumed by shallow up level b lives at resolution
        height/2^b with the channel width of up level b+1 (the mid block's
        when b is the deepest level).
        """
        b = int(cache_branch_id)
        n = len(self.config.block_out_channels)
        ch = self.config.block_out_channels[min(b + 1, n - 1)]
        return (height >> b, width >> b, ch)
