"""SD3Engine — the rectified-flow (SD3-class) engine.

Beyond-reference model family: pairs ``models/mmdit.py`` (MMDiT velocity
transformer) with the 16-channel SD3 KL-VAE and dual CLIP text towers,
sampled by ``FlowMatchEulerScheduler`` plans through the SAME
``StableDiffusionEngine.sample`` scan loop (CFG, x0 capture,
micro-batching, mesh sharding all apply unchanged).

Text conditioning follows the SD3 pipeline's CLIP-only mode (T5 dropped —
the paper's ablation keeps most quality; diffusers supports the same
drop-T5 configuration):

 - context tokens: penultimate hidden states of CLIP-L ++ CLIP-bigG on
   the feature axis (768 + 1280 = 2048), zero-padded to
   ``joint_attention_dim`` (4096, the T5 width) exactly as diffusers pads
   clip-only prompts;
 - pooled vector: both towers' projected pooled embeddings concatenated
   (768 + 1280 = 2048) -> ``added_cond["text_embeds"]``.

Reference counterpart: none (the reference drives SD-1.5 only,
/root/reference/src/models.py:227-235); diffusers' SD3 pipeline is the
public reference implementation this engine mirrors.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sonicdiffusionbayeslab_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from sonicdiffusionbayeslab_tpu.models.mmdit import MMDiT, MMDiTConfig
from sonicdiffusionbayeslab_tpu.models.sampler import (
    SDXLTextConfigs,
    StableDiffusionEngine,
)
from sonicdiffusionbayeslab_tpu.models.vae import AutoencoderKL, VAEConfig


class SD3Engine(StableDiffusionEngine):
    """MMDiT + SD3 VAE + dual CLIP towers through the shared scan engine."""

    def __init__(
        self,
        mmdit_config: MMDiTConfig = None,
        vae_config: VAEConfig = None,
        text_configs: SDXLTextConfigs = None,
        t5_config=None,
        use_t5: bool = False,
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
    ):
        # No super().__init__: the base builds a UNet + ControlNet pair;
        # this engine's denoiser is the MMDiT.  ``unet``/``unet_config``
        # keep their names so _denoise_fn / sample() drive it unchanged.
        self.unet_config = mmdit_config or MMDiTConfig.sd3_medium()
        self.vae_config = vae_config or VAEConfig.sd3()
        tc = text_configs or SDXLTextConfigs.sdxl()
        self.text_config = tc.text1
        self.text2_config = tc.text2
        self.unet = MMDiT(self.unet_config, dtype=dtype, param_dtype=param_dtype)
        self.vae = AutoencoderKL(self.vae_config, dtype=dtype, param_dtype=param_dtype)
        self.text = CLIPTextModel(self.text_config, dtype=dtype, param_dtype=param_dtype)
        self.text2 = CLIPTextModel(self.text2_config, dtype=dtype, param_dtype=param_dtype)
        self.controlnet = None  # no ControlNet family for MMDiT (yet)
        # Optional third tower (full SD3 conditioning): T5 hidden states are
        # concatenated on the SEQUENCE axis after the padded CLIP features
        # (diffusers encode_prompt).  Off by default — the drop-T5 mode.
        self.t5 = None
        if use_t5 or t5_config is not None:
            from sonicdiffusionbayeslab_tpu.models.t5 import T5Config, T5Encoder

            self.t5_config = t5_config or T5Config.xxl()
            if self.t5_config.d_model != self.unet_config.joint_attention_dim:
                raise ValueError(
                    f"T5 d_model {self.t5_config.d_model} must equal the "
                    f"MMDiT joint_attention_dim {self.unet_config.joint_attention_dim}")
            self.t5 = T5Encoder(self.t5_config, dtype=dtype, param_dtype=param_dtype)

    # ------------------------------------------------------------- params
    def init_params(self, seed: int = 0, latent_hw: int = 128,
                    skip_t5: bool = False) -> Dict[str, Any]:
        cfg = self.unet_config
        k1, k2, k3, k4, k5, k6 = jax.random.split(jax.random.PRNGKey(seed), 6)
        lat = jnp.zeros((1, latent_hw, latent_hw, cfg.in_channels))
        ctx = jnp.zeros((1, self.text_config.max_length, cfg.joint_attention_dim))
        added = {"text_embeds": jnp.zeros((1, cfg.pooled_projection_dim))}
        ids1 = jnp.zeros((1, self.text_config.max_length), jnp.int32)
        ids2 = jnp.zeros((1, self.text2_config.max_length), jnp.int32)
        h1, h2 = self.text_config.hidden_size, self.text2_config.hidden_size
        out = {
            "unet": self.unet.init(k1, lat, jnp.zeros((1,)), ctx, added)["params"],
            "vae": self.vae.init(k2, lat, method=self.vae.init_all)["params"],
            "text": self.text.init(k3, ids1)["params"],
            "text2": self.text2.init(k4, ids2)["params"],
            # Both towers are CLIPTextModelWithProjection in SD3.
            "text_proj": {"kernel": jax.random.normal(k5, (h1, h1), jnp.float32) * h1**-0.5},
            "text2_proj": {"kernel": jax.random.normal(k6, (h2, h2), jnp.float32) * h2**-0.5},
        }
        if self.t5 is not None and not skip_t5:
            out["t5"] = self.init_t5_params(seed)
        return out

    def init_t5_params(self, seed: int = 0) -> Dict[str, Any]:
        """The T5 subtree of :meth:`init_params`, alone (same key
        derivation, so staged == resident for random weights).  Callers
        staging T5 off-chip run this under ``jax.default_device(cpu)`` —
        T5-XXL is ~9.5 GB bf16 and must not claim HBM the MMDiT needs."""
        k1 = jax.random.split(jax.random.PRNGKey(seed), 6)[0]
        ids3 = jnp.zeros((1, self.t5_config.max_length), jnp.int32)
        return self.t5.init(jax.random.fold_in(k1, 3), ids3)["params"]

    # ------------------------------------------------------------- encode
    @functools.cached_property
    def encode_sd3_fn(self):
        pad_to = self.unet_config.joint_attention_dim

        @jax.jit
        def encode(text_p, text2_p, proj1, proj2, ids1, ids2):
            o1 = self.text.apply({"params": text_p}, ids1)
            o2 = self.text2.apply({"params": text2_p}, ids2)
            ctx = jnp.concatenate(
                [o1["penultimate_hidden_state"], o2["penultimate_hidden_state"]],
                axis=-1,
            )
            pad = pad_to - ctx.shape[-1]
            if pad < 0:
                raise ValueError(
                    f"CLIP feature dim {ctx.shape[-1]} exceeds joint_attention_dim {pad_to}")
            if pad:
                ctx = jnp.pad(ctx, ((0, 0), (0, 0), (0, pad)))
            pooled = jnp.concatenate(
                [o1["pooled_output"] @ proj1["kernel"],
                 o2["pooled_output"] @ proj2["kernel"]],
                axis=-1,
            )
            return ctx, pooled

        return encode

    @functools.cached_property
    def encode_sd3_t5_fn(self):
        """Full triple-tower conditioning: [padded CLIP ctx ++ T5 states]
        on the sequence axis (diffusers encode_prompt token order)."""
        clip_fn, t5 = self.encode_sd3_fn, self.t5

        @jax.jit
        def encode(text_p, text2_p, t5_p, proj1, proj2, ids1, ids2, ids3):
            ctx, pooled = clip_fn(text_p, text2_p, proj1, proj2, ids1, ids2)
            states = t5.apply({"params": t5_p}, ids3)["last_hidden_state"]
            return jnp.concatenate([ctx, states], axis=1), pooled

        return encode

    def encode_prompts_sd3(self, params, ids1: np.ndarray, ids2: np.ndarray,
                           ids3: np.ndarray = None):
        """-> (context [B, T(+T5), joint_attention_dim], pooled [B, 2048])."""
        if ids3 is not None:
            if self.t5 is None:
                raise ValueError("engine was built without use_t5=True")
            return self.encode_sd3_t5_fn(
                params["text"], params["text2"], params["t5"], params["text_proj"],
                params["text2_proj"], jnp.asarray(ids1), jnp.asarray(ids2),
                jnp.asarray(ids3),
            )
        return self.encode_sd3_fn(
            params["text"], params["text2"], params["text_proj"],
            params["text2_proj"], jnp.asarray(ids1), jnp.asarray(ids2),
        )
