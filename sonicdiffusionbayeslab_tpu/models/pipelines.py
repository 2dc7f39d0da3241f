"""Registered pipelines (models registry, parity names: reference
src/models.py:21, 338, 733, 1138).

Where the reference has four near-duplicate ~350-line torch pipelines, the
TPU rebuild has ONE engine (models/sampler.py) and four thin classes that
differ only in how they compose the :class:`SamplePlan`.  Call contract is
kept: ``pipe(prompts, ...) -> (output, execution_time, x0_images)`` with
loop-only timing (src/models.py:329-335).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sonicdiffusionbayeslab_tpu.models.clip_text import CLIPTextConfig
from sonicdiffusionbayeslab_tpu.models.sampler import StableDiffusionEngine
from sonicdiffusionbayeslab_tpu.models.tokenizer import load_tokenizer
from sonicdiffusionbayeslab_tpu.models.unet import UNetConfig
from sonicdiffusionbayeslab_tpu.models.vae import VAEConfig
from sonicdiffusionbayeslab_tpu.registry import models_registry
from sonicdiffusionbayeslab_tpu.schedulers import plans as plan_composers


@models_registry.add_to_registry("stable_diffusion_model")
class StableDiffusionModel:
    """Single-scheduler text->image pipeline (reference models.py:21-335)."""

    def __init__(
        self,
        pretrained_model: str = "runwayml/stable-diffusion-v1-5",
        image_size: int = 512,
        tiny: bool = False,
        dtype: str = "bfloat16",
        seed: int = 0,
        lora: str = None,  # consumed by ConsistencyModelMethod.setup_model
        variant: str = "auto",  # sd15 | sd21 | auto (snapshot/name detection)
        # Multi-chip sampling: sizes of the ('data','seq','model') mesh axes.
        # 0/1 everywhere (default) = single device. With a mesh, params are
        # placed by the TP rules and every call shards batch + latents.
        mesh_data: int = 0,
        mesh_seq: int = 1,
        mesh_model: int = 1,
        # IP-Adapter checkpoint (.bin) for image-prompt conditioning; calls
        # then accept ip_image_embeds=/ip_scale=. A non-existent path in the
        # offline env random-inits the adapter (random base weights anyway).
        ip_adapter: str = None,
        ip_scale: float = 1.0,
        # Opt-in (word:1.3) emphasis syntax (models/prompt_weighting.py).
        # Off by default: reference-protocol captions may contain literal
        # parentheses that must not become emphasis.
        prompt_weighting: bool = False,
    ):
        self.lora = lora
        self.pretrained_model = pretrained_model
        self.image_size = int(image_size)
        self.tiny = bool(tiny)
        self.variant = self._resolve_variant(variant, pretrained_model)
        dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.engine = self._make_engine(dt, tiny)
        self.mesh = None
        n_data = int(mesh_data) or 1  # 0 = unset; TP/SP-only meshes still count
        if n_data * int(mesh_seq) * int(mesh_model) > 1:
            from sonicdiffusionbayeslab_tpu.parallel import make_mesh

            self.mesh = make_mesh(
                n_data=n_data, n_model=int(mesh_model), n_seq=int(mesh_seq)
            )
        self.latent_hw = self.image_size // 8 if not tiny else 8
        self.params = self._load_params(pretrained_model, seed)
        self.ip_scale = float(ip_scale)
        self.prompt_weighting = bool(prompt_weighting)
        self.has_ip = ip_adapter is not None
        if self.has_ip:
            from sonicdiffusionbayeslab_tpu.models.ip_adapter import (
                extract_ip_params,
                load_ip_adapter,
                merge_ip_params,
            )

            self.params = dict(self.params)
            if Path(ip_adapter).exists():
                loaded = load_ip_adapter(ip_adapter, self.engine)
                self.params["unet"] = merge_ip_params(self.params["unet"], loaded["unet_ip"])
                self.params["image_proj"] = loaded["image_proj"]
                self.ip_embed_dim = loaded["embed_dim"]
            else:
                rand = self.engine.init_ip_params(latent_hw=self.latent_hw)
                self.params["unet"] = merge_ip_params(
                    self.params["unet"],
                    extract_ip_params(rand["unet"], self.engine.unet_config),
                )
                self.params["image_proj"] = rand["image_proj"]
                self.ip_embed_dim = 1024
        if self.mesh is not None:
            from sonicdiffusionbayeslab_tpu.parallel import shard_params

            self.params = shard_params(self.params, self.mesh)
        tok_dir = Path(pretrained_model) / "tokenizer" if Path(pretrained_model).exists() else None
        self.tokenizer = load_tokenizer(
            str(tok_dir) if tok_dir else None,
            self.engine.text_config.vocab_size,
            self.engine.text_config.max_length,
        )
        self.scheduler = None  # a plan builder, assigned by the experiment
        self.num_timesteps = 0  # NFE of the last call (reference attribute)
        self.cache_plan_fn = None  # DeepCache hook (set by DeepCacheMethod)
        self.tome_ratio = None  # Token Merging hook (set by TomeMethod / config)
        self.unet_microbatch = None  # batch-32 memory fix (inference.unet_microbatch)
        self.guidance_rescale = 0.0
        self._embed_cache: Dict[str, np.ndarray] = {}
        self._post_init()

    @staticmethod
    def _resolve_variant(variant: str, pretrained_model: str) -> str:
        """sd15 vs sd21 (SD-2.x: OpenCLIP ViT-H context 1024, 64-wide heads,
        linear transformer projections — beyond-reference model family).
        'auto' reads a local snapshot's unet/config.json when present, else
        falls back to hub-id naming."""
        if variant != "auto":
            if variant not in ("sd15", "sd21"):
                raise ValueError(f"unknown variant {variant!r} (sd15|sd21|auto)")
            return variant
        cfg_path = Path(pretrained_model) / "unet" / "config.json"
        if cfg_path.exists():
            import json

            c = json.loads(cfg_path.read_text())
            return "sd21" if int(c.get("cross_attention_dim", 768)) == 1024 else "sd15"
        name = pretrained_model.lower()
        return "sd21" if ("stable-diffusion-2" in name or "sd2" in name) else "sd15"

    def _make_engine(self, dt, tiny: bool) -> StableDiffusionEngine:
        if tiny:
            if self.variant == "sd21":
                return StableDiffusionEngine(
                    UNetConfig.tiny21(), VAEConfig.tiny(), CLIPTextConfig.tiny21(),
                    dtype=dt, param_dtype=dt,
                )
            return StableDiffusionEngine(
                UNetConfig.tiny(), VAEConfig.tiny(), CLIPTextConfig.tiny(),
                dtype=dt, param_dtype=dt,
            )
        if self.variant == "sd21":
            return StableDiffusionEngine(
                UNetConfig.sd21(), VAEConfig.sd15(), CLIPTextConfig.sd21(),
                dtype=dt, param_dtype=dt,
            )
        return StableDiffusionEngine(dtype=dt, param_dtype=dt)

    def _post_init(self) -> None:
        """Subclass hook (extra tokenizers etc.)."""

    def _extra_sample_kwargs(self, batch: int, lat_hw) -> Dict[str, Any]:
        """Subclass hook: extra engine.sample kwargs (SDXL added_cond).
        ``lat_hw`` is the call's latent grid (height/width overrides)."""
        return {}

    def _load_params(self, pretrained_model: str, seed: int) -> Dict[str, Any]:
        p = Path(pretrained_model)
        if p.exists():
            flax_ckpt = p / "flax_params"
            if flax_ckpt.exists():
                from sonicdiffusionbayeslab_tpu.models.weights import load_params

                return load_params(flax_ckpt)
            from sonicdiffusionbayeslab_tpu.models.weights import load_sd_checkpoint

            return load_sd_checkpoint(p, self.engine)
        # No local snapshot (offline environment): deterministic random init.
        return self.engine.init_params(seed=seed, latent_hw=self.latent_hw)

    @classmethod
    def from_pretrained(cls, pretrained_model: str, **kw):
        return cls(pretrained_model=pretrained_model, **kw)

    # ------------------------------------------------------------- plans
    def build_plan(self, num_inference_steps: int, **call_kw):
        if self.scheduler is None:
            raise RuntimeError("no scheduler assigned; experiment must call setup_scheduler")
        return self.scheduler.build_plan(num_inference_steps)

    # -------------------------------------------------------------- call
    def __call__(
        self,
        prompt: Sequence[str],
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        key: Optional[jax.Array] = None,
        sample_indices: Optional[np.ndarray] = None,
        negative_prompt: Optional[Sequence[str]] = None,
        use_x0: bool = False,
        x0_samples: Optional[int] = None,  # None = full batch (reference contract)
        output_type: str = "np",
        init_image: Optional[np.ndarray] = None,  # img2img: [B,H,W,3] in [0,1]
        strength: float = 0.8,
        mask_image: Optional[np.ndarray] = None,  # inpaint: [B,H,W(,1)], 1=regenerate
        ip_image_embeds: Optional[np.ndarray] = None,  # IP-Adapter [B, E]
        ip_scale: Optional[float] = None,
        height: Optional[int] = None,  # non-square generation (default:
        width: Optional[int] = None,  # image_size x image_size)
        tome_ratio: Optional[float] = None,  # Token Merging (ops/tome.py);
        # None falls back to the pipeline-level hook self.tome_ratio
        unet_microbatch: Optional[int] = None,  # chunked UNet inside the scan
        # (exact; the batch-32 fix); None falls back to self.unet_microbatch
        time_loop: bool = True,  # False: skip the loop-timing hard sync so
        # the whole batch (denoise + decode + quantize) dispatches
        # asynchronously; execution_time comes back -1.0 (serving path)
        **plan_kw,
    ):
        """Returns (images [B,H,W,3] in [0,1], execution_time, x0_images)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        lat_hw = (self.latent_hw, self.latent_hw)
        if height is not None or width is not None:
            h = int(height or self.image_size)
            w = int(width or self.image_size)
            if h % 8 or w % 8:
                raise ValueError(f"height/width must be multiples of 8, got {h}x{w}")
            if init_image is not None:
                raise ValueError("height/width override is text2img-only")
            lat_hw = (h // 8, w // 8)
        if mask_image is not None and init_image is None:
            raise ValueError("mask_image requires init_image")
        init_latents = None
        blend = None
        if init_image is not None:
            # img2img (diffusers strength semantics): run only the last
            # round(n * strength) steps, seeding with the encoded image
            # noised to the start step's level in the plan's native space.
            if self.scheduler is None or not hasattr(self.scheduler, "tail_plan"):
                raise RuntimeError("img2img needs a scheduler with tail_plan")
            n = int(num_inference_steps)
            start = max(n - min(int(n * strength), n), 0)
            if start >= n:
                raise ValueError(f"strength {strength} leaves no steps to run")
            plan = self.scheduler.tail_plan(n, start)
            img = jnp.asarray(init_image, jnp.float32)
            key, enc_key, noise_key = jax.random.split(key, 3)
            z = self.engine.encode_image_fn(self.params["vae"], img, enc_key)
            noise = jax.random.normal(noise_key, z.shape, jnp.float32)
            init_latents = self.scheduler.noised_latents(z, noise, n, start)
            if mask_image is not None:
                # Inpainting: per-step masked blend with the re-noised source
                # (legacy masked-img2img; mask 1 = regenerate region).
                m = jnp.asarray(mask_image, jnp.float32)
                if m.ndim == 3:
                    m = m[..., None]
                m = jax.image.resize(m, (m.shape[0],) + z.shape[1:3] + (1,), "nearest")
                blend_a, blend_s = self.scheduler.blend_schedule(n, start)
                if len(blend_a) != plan.num_steps:
                    raise RuntimeError("blend schedule misaligned with plan rows")
                blend = (m, z, blend_a, blend_s)
        else:
            plan = self.build_plan(num_inference_steps, **plan_kw)
        self.num_timesteps = plan.nfe

        embeds = self._encode(list(prompt))
        neg = None
        if guidance_scale > 1.0:
            neg = self._encode(list(negative_prompt) if negative_prompt else [""] * len(prompt))

        ip_arg = None
        if ip_image_embeds is not None:
            if not getattr(self, "has_ip", False):
                raise ValueError("pipeline built without ip_adapter; pass ip_adapter=")
            emb = jnp.asarray(ip_image_embeds, jnp.float32)
            if emb.shape[-1] != self.ip_embed_dim:
                raise ValueError(
                    f"ip_image_embeds dim {emb.shape[-1]} != adapter's "
                    f"embedding dim {self.ip_embed_dim}"
                )
            ip_arg = {
                "image_embeds": emb,
                "scale": self.ip_scale if ip_scale is None else float(ip_scale),
            }

        cache_plan = self.cache_plan_fn(plan.num_steps) if self.cache_plan_fn else None
        out = self.engine.sample(
            self.params,
            plan,
            embeds,
            neg,
            key,
            sample_indices=sample_indices,
            guidance_scale=guidance_scale,
            guidance_rescale=self.guidance_rescale,
            cache_plan=cache_plan,
            latent_hw=lat_hw,
            collect_x0=use_x0,
            x0_samples=x0_samples,
            decode=output_type != "latent",
            init_latents=init_latents,
            blend=blend,
            mesh=self.mesh,
            ip_adapter=ip_arg,
            tome=self.tome_ratio if tome_ratio is None else tome_ratio,
            microbatch=self.unet_microbatch if unet_microbatch is None else unet_microbatch,
            time_loop=time_loop,
            **self._extra_sample_kwargs(len(prompt), lat_hw),
        )
        if output_type == "device":
            # Serving fast path: hand back the (possibly still-executing)
            # device arrays so the caller can overlap this batch's VAE
            # decode + D2H readback with the next batch's dispatch
            # (serving/batcher.py pipeline_depth).  np.asarray on the
            # result performs the readback.
            images = out.images if out.images is not None else out.latents
            return images, out.execution_time, out.x0_images
        images = np.asarray(out.images) if out.images is not None else np.asarray(out.latents)
        x0 = np.asarray(out.x0_images) if out.x0_images is not None else None
        return images, out.execution_time, x0

    def _encode(self, prompts: Sequence[str]) -> jax.Array:
        # Uniform-batch memo: serving re-encodes the all-"" negative batch
        # (and often a repeated prompt) every call; identical strings give
        # identical rows, so cache the encoded states keyed on
        # (prompt, batch size).  Tiny (4 entries x ~1 MB device memory),
        # invalidated implicitly by params identity.
        memo_key = None
        if prompts and all(p == prompts[0] for p in prompts):
            cache = getattr(self, "_encode_memo", None)
            if cache is None or cache[0] is not self.params:
                cache = (self.params, {})
                self._encode_memo = cache
            memo_key = (prompts[0], len(prompts))
            hit = cache[1].get(memo_key)
            if hit is not None:
                return hit
        states = self._encode_uncached(prompts)
        if memo_key is not None:
            if len(self._encode_memo[1]) >= 4:
                self._encode_memo[1].pop(next(iter(self._encode_memo[1])))
            self._encode_memo[1][memo_key] = states
        return states

    def _encode_uncached(self, prompts: Sequence[str]) -> jax.Array:
        if not getattr(self, "prompt_weighting", False):
            ids = self.tokenizer(list(prompts))
            return self.engine.encode_prompts(self.params, ids)
        from sonicdiffusionbayeslab_tpu.models.prompt_weighting import (
            apply_prompt_weights,
            batch_weighted_ids,
        )

        # (word:1.3) emphasis syntax -> per-token hidden-state scaling with
        # mean renormalization; prompts with no syntax take an identical
        # token path and skip the rescale.
        ids, weights = batch_weighted_ids(self.tokenizer, list(prompts))
        states = self.engine.encode_prompts(self.params, ids)
        if np.any(weights != 1.0):
            states = apply_prompt_weights(states, weights)
        return states

    # Parity shims for device juggling in the reference sweeps
    # (e.g. ddim.py:31-33 model.to("cpu")): JAX manages placement; no-ops.
    def to(self, device: str):
        return self

    def fuse_lora(self, scale: float = 1.0):
        """Merge pending LoRA deltas into the UNet params (reference
        consistency_model.py:20-21 fuse path)."""
        if getattr(self, "_pending_lora", None) is not None:
            from sonicdiffusionbayeslab_tpu.models.weights import merge_lora, unet_name_map

            self.params = dict(self.params)
            self.params["unet"] = merge_lora(
                self.params["unet"], self._pending_lora,
                unet_name_map(self.engine.unet_config), scale,
            )
            self._pending_lora = None
        return self

    def load_lora_weights(self, path: str):
        """Stage a LoRA state dict (diffusers kohya or peft layout) from a
        local file/snapshot; a hub id with no local file is a logged no-op
        (offline environment) so LCM *sampling* semantics still run."""
        from pathlib import Path as _P

        p = _P(path)
        candidates = [p] if p.is_file() else [
            p / "pytorch_lora_weights.bin", p / "pytorch_lora_weights.safetensors"
        ]
        for c in candidates:
            if c.exists():
                from sonicdiffusionbayeslab_tpu.models.weights import load_torch_state_dict

                self._pending_lora = load_torch_state_dict(c)
                return self
        self._pending_lora = None
        return self


@models_registry.add_to_registry("stable_diffusion_xl_model")
class StableDiffusionXLModel(StableDiffusionModel):
    """SDXL text->image pipeline (beyond-reference model family).

    Same sampling engine, schedulers, DeepCache, img2img/inpainting and
    metric protocol as the SD pipeline; the deltas are SDXL's dual text
    towers (CLIP ViT-L + OpenCLIP bigG, penultimate states concatenated)
    and the text_time micro-conditioning (pooled bigG embedding + size/crop
    time_ids) handed to the UNet's add_embedding.
    """

    def __init__(
        self,
        pretrained_model: str = "stabilityai/stable-diffusion-xl-base-1.0",
        image_size: int = 1024,
        tiny: bool = False,
        dtype: str = "bfloat16",
        seed: int = 0,
        lora: str = None,
        mesh_data: int = 0,
        mesh_seq: int = 1,
        mesh_model: int = 1,
        prompt_weighting: bool = False,
    ):
        super().__init__(pretrained_model=pretrained_model, image_size=image_size,
                         tiny=tiny, dtype=dtype, seed=seed, lora=lora,
                         mesh_data=mesh_data, mesh_seq=mesh_seq, mesh_model=mesh_model,
                         prompt_weighting=prompt_weighting)

    def _make_engine(self, dt, tiny: bool):
        from sonicdiffusionbayeslab_tpu.models.sampler import SDXLEngine, SDXLTextConfigs

        if tiny:
            return SDXLEngine(
                UNetConfig.tiny_xl(), VAEConfig.tiny(), SDXLTextConfigs.tiny(),
                dtype=dt, param_dtype=dt,
            )
        return SDXLEngine(dtype=dt, param_dtype=dt)

    def _post_init(self) -> None:
        p = Path(self.pretrained_model)
        tok2 = p / "tokenizer_2" if p.exists() else None
        self.tokenizer2 = load_tokenizer(
            str(tok2) if tok2 else None,
            self.engine.text2_config.vocab_size,
            self.engine.text2_config.max_length,
        )
        self._pooled_queue: list = []

    def _load_params(self, pretrained_model: str, seed: int) -> Dict[str, Any]:
        p = Path(pretrained_model)
        if p.exists():
            flax_ckpt = p / "flax_params"
            if flax_ckpt.exists():
                from sonicdiffusionbayeslab_tpu.models.weights import load_params

                return load_params(flax_ckpt)
            from sonicdiffusionbayeslab_tpu.models.weights import load_sdxl_checkpoint

            return load_sdxl_checkpoint(p, self.engine)
        return self.engine.init_params(seed=seed, latent_hw=self.latent_hw)

    def _encode(self, prompts: Sequence[str]) -> jax.Array:
        if not getattr(self, "prompt_weighting", False):
            ids1 = self.tokenizer(list(prompts))
            ids2 = self.tokenizer2(list(prompts))
            ctx, pooled = self.engine.encode_prompts_xl(self.params, ids1, ids2)
            self._pooled_queue.append(pooled)
            return ctx
        from sonicdiffusionbayeslab_tpu.models.prompt_weighting import (
            apply_prompt_weights,
            batch_weighted_ids,
        )

        # Dual-tower weighting: each tower gets weights aligned with ITS
        # tokenizer (the feature concat keeps tower-1 states in the first
        # hidden_size dims, tower-2 after); pooled stays unweighted (compel
        # convention).
        ids1, w1 = batch_weighted_ids(self.tokenizer, list(prompts))
        ids2, w2 = batch_weighted_ids(self.tokenizer2, list(prompts))
        ctx, pooled = self.engine.encode_prompts_xl(self.params, ids1, ids2)
        self._pooled_queue.append(pooled)
        if np.any(w1 != 1.0) or np.any(w2 != 1.0):
            h1 = self.engine.text_config.hidden_size
            ctx = jnp.concatenate(
                [apply_prompt_weights(ctx[..., :h1], w1),
                 apply_prompt_weights(ctx[..., h1:], w2)],
                axis=-1,
            )
        return ctx

    def _extra_sample_kwargs(self, batch: int, lat_hw) -> Dict[str, Any]:
        # __call__ encodes positive first, then (under CFG) negative.
        queue, self._pooled_queue = self._pooled_queue, []
        # time_ids = (orig_h, orig_w, crop_top, crop_left, target_h, target_w)
        # — follows the call's latent grid so height/width overrides keep the
        # micro-conditioning consistent (SDXL is trained to react to these).
        h, w = float(lat_hw[0] * 8), float(lat_hw[1] * 8)
        time_ids = jnp.tile(
            jnp.asarray([[h, w, 0.0, 0.0, h, w]], jnp.float32), (batch, 1)
        )
        added = {"text_embeds": queue[0], "time_ids": time_ids}
        if len(queue) > 1:
            added["negative_text_embeds"] = queue[1]
        return {"added_cond": added}


@models_registry.add_to_registry("stable_diffusion_3_model")
class StableDiffusion3Model(StableDiffusionXLModel):
    """SD3-class rectified-flow text->image pipeline (beyond-reference
    model family; models/mmdit.py + models/sd3.py).

    The denoiser is the MMDiT velocity transformer sampled with
    ``flow_match_euler_scheduler`` plans; everything else — the scan
    engine, CFG, x0 capture, micro-batching, mesh sharding, img2img
    seeding — is the shared machinery.  Text conditioning defaults to the
    SD3 CLIP-only (drop-T5) mode: dual-tower penultimate states zero-padded
    to the T5 width plus both projected pooled embeddings (models/sd3.py).
    ``use_t5: true`` enables the full triple-tower conditioning — T5-XXL
    hidden states concatenated after the CLIP features on the sequence axis
    (models/t5.py), loaded from a snapshot's text_encoder_3/tokenizer_3.

    DeepCache works for this family too — the MMDiT implements the same
    ``cache``/``return_cache``/``cache_branch_id`` interface as the UNet
    (trunk-delta caching: blocks 0..b-1 fresh, the deep stack's residual
    replayed between full steps — models/mmdit.py), so ``DeepCacheMethod``
    / ``cache_plan_fn`` drive it unchanged.  Token Merging works too
    (``tome_ratio`` / ``SDBL_TOME_RATIO``): the DiT-ToMe hook merges the
    most redundant IMAGE tokens around each block's joint attention — the
    text stream is never merged (models/mmdit.py MMDiTBlock).  Int8 W8A8
    projections (``SDBL_QUANT=int8``) hit every MMDiT projection/FFN via
    ``projection_dense`` (conv quant modes have no conv to hit here).

    Not available for this family (loud errors, not silent no-ops):
    ControlNet, IP-Adapter, ``(word:1.3)`` prompt weighting.
    """

    def __init__(self, pretrained_model: str = "stabilityai/stable-diffusion-3-medium",
                 image_size: int = 1024, use_t5: bool = False,
                 t5_staged: object = "auto", **kw):
        if kw.get("prompt_weighting"):
            raise NotImplementedError(
                "prompt weighting is not wired for SD3's padded dual-tower "
                "context (weights would need to apply before the T5-width pad)")
        if kw.get("ip_adapter"):
            raise NotImplementedError("IP-Adapter is a UNet-family feature")
        self._use_t5 = bool(use_t5)  # read by _make_engine (runs in super())
        self._t5_staged_opt = t5_staged  # read by _load_params (runs in super())
        self._t5_host = None  # host-resident T5 params when staging
        self._t5_dev = None  # live device copy during the encode phase
        super().__init__(pretrained_model=pretrained_model,
                         image_size=image_size, **kw)

    def _t5_staged_active(self) -> bool:
        """Single-chip memory strategy for ``use_t5: true`` (docs/MODELS.md):
        T5-XXL is ~9.5 GB bf16 next to the ~4.1 GB MMDiT + 1.7 GB dual CLIP
        + VAE — all-resident is over the 15.75 GB v5e HBM before a single
        activation.  But the T5 encode is a one-shot phase per batch, so
        staged mode keeps T5 params in host RAM, transfers them for the
        encode, and frees the device copy before the denoising loop starts
        (``_extra_sample_kwargs``).  Encode-phase residency: T5 + CLIPs
        ~11.2 GB; sample-phase: MMDiT + VAE ~4.3 GB — both fit.  On a mesh
        the TP rules shard T5 over 'model' instead (parallel/mesh.py)."""
        if not self._use_t5:
            return False
        opt = self._t5_staged_opt
        if opt in (False, "false", "off", "resident"):
            return False
        if self.mesh is not None:
            return False  # multi-chip: TP-resident via shard_params
        if opt in (True, "true", "staged"):
            return True
        return not self.tiny  # "auto": real geometry on a single chip

    def _make_engine(self, dt, tiny: bool):
        from sonicdiffusionbayeslab_tpu.models.mmdit import MMDiTConfig
        from sonicdiffusionbayeslab_tpu.models.sampler import SDXLTextConfigs
        from sonicdiffusionbayeslab_tpu.models.sd3 import SD3Engine
        from sonicdiffusionbayeslab_tpu.models.t5 import T5Config
        from sonicdiffusionbayeslab_tpu.models.vae import VAEConfig as _V

        if tiny:
            return SD3Engine(MMDiTConfig.tiny(), _V.tiny16(),
                             SDXLTextConfigs.tiny(),
                             t5_config=T5Config.tiny() if self._use_t5 else None,
                             dtype=dt, param_dtype=dt)
        return SD3Engine(use_t5=self._use_t5, dtype=dt, param_dtype=dt)

    def _post_init(self) -> None:
        super()._post_init()
        self.tokenizer3 = None
        if self._use_t5:
            from sonicdiffusionbayeslab_tpu.models.tokenizer import load_t5_tokenizer

            p = Path(self.pretrained_model)
            tok3 = p / "tokenizer_3" if p.exists() else None
            self.tokenizer3 = load_t5_tokenizer(
                str(tok3) if tok3 else None,
                self.engine.t5_config.vocab_size,
                self.engine.t5_config.max_length,
            )

    def _load_params(self, pretrained_model: str, seed: int) -> Dict[str, Any]:
        staged = self._t5_staged_active()
        p = Path(pretrained_model)
        if p.exists():
            flax_ckpt = p / "flax_params"
            if flax_ckpt.exists():
                from sonicdiffusionbayeslab_tpu.models.weights import load_params

                params = load_params(flax_ckpt)
            else:
                from sonicdiffusionbayeslab_tpu.models.weights import (
                    load_sd3_checkpoint,
                )

                params = load_sd3_checkpoint(p, self.engine)
            if staged and "t5" in params:
                params = dict(params)
                # Checkpoint loaders return host numpy — keep the T5
                # subtree there; everything else lands on device lazily.
                self._t5_host = jax.device_get(params.pop("t5"))
            return params
        if staged:
            params = self.engine.init_params(seed=seed, latent_hw=self.latent_hw,
                                             skip_t5=True)
            # Random-init the 4.7B tower ON the accelerator, then evacuate
            # to host RAM and free the device copy before sampling claims
            # HBM.  A host-CPU init of 4.7B threefry draws takes >50 min on
            # a single core (measured); on-device it is seconds, the key
            # derivation is unchanged (staged == resident bit-for-bit), and
            # at init time the device holds only the ~4.1 GB MMDiT+CLIP+VAE
            # tree, so the 9.5 GB bf16 T5 fits transiently.  If it does
            # not (smaller chip), fall back to the slow host init.
            try:
                t5_dev = self.engine.init_t5_params(seed)
                self._t5_host = jax.device_get(t5_dev)
                for leaf in jax.tree_util.tree_leaves(t5_dev):
                    leaf.delete()
            except jax.errors.JaxRuntimeError:
                with jax.default_device(jax.devices("cpu")[0]):
                    self._t5_host = jax.device_get(self.engine.init_t5_params(seed))
            return params
        return self.engine.init_params(seed=seed, latent_hw=self.latent_hw)

    def _encode(self, prompts: Sequence[str]) -> jax.Array:
        ids1 = self.tokenizer(list(prompts))
        ids2 = self.tokenizer2(list(prompts))
        ids3 = self.tokenizer3(list(prompts)) if self.tokenizer3 is not None else None
        params = self.params
        if ids3 is not None and self._t5_host is not None:
            if self._t5_dev is None:
                self._t5_dev = jax.device_put(self._t5_host)
            params = {**params, "t5": self._t5_dev}
        ctx, pooled = self.engine.encode_prompts_sd3(params, ids1, ids2, ids3)
        self._pooled_queue.append(pooled)
        return ctx

    def _release_t5(self) -> None:
        """Free the staged T5 device copy before sampling claims HBM.

        The pooled embeds are outputs of the same jit as the context, so
        blocking on them guarantees every in-flight use of the T5 buffers
        has retired before ``delete()``."""
        if self._t5_dev is None:
            return
        for pooled in self._pooled_queue:
            pooled.block_until_ready()
        for leaf in jax.tree_util.tree_leaves(self._t5_dev):
            leaf.delete()
        self._t5_dev = None

    def _extra_sample_kwargs(self, batch: int, lat_hw) -> Dict[str, Any]:
        self._release_t5()
        queue, self._pooled_queue = self._pooled_queue, []
        # time_ids is engine plumbing only (the microbatch chunker expects
        # the key); MMDiT carries no crop/size micro-conditioning and
        # ignores it.
        added = {"text_embeds": queue[0],
                 "time_ids": jnp.zeros((batch, 6), jnp.float32)}
        if len(queue) > 1:
            added["negative_text_embeds"] = queue[1]
        return {"added_cond": added}


class _TwoSchedulersPlanMixin:
    """Scheduler-switching plan construction — model-family independent
    (the plan composers are pure row math, schedulers/plans.py)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.scheduler_first = None
        self.scheduler_second = None

    def build_plan(self, num_inference_steps, num_inference_steps_second=None,
                   num_step_switch=1, type_switch="closest", **_):
        return plan_composers.two_scheduler_plan(
            self.scheduler_first,
            self.scheduler_second,
            num_inference_steps,
            num_inference_steps_second or num_inference_steps,
            num_step_switch,
            type_switch,
        )


class _InterlivingPlanMixin:
    """Interleaved-scheduler plan construction — model-family independent."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.scheduler_main = None
        self.scheduler_inter = None

    def build_plan(self, num_inference_steps, interliving_steps=(),
                   interleave_mode="ladder", **_):
        return plan_composers.interleave_plan(
            self.scheduler_main, self.scheduler_inter, num_inference_steps,
            interliving_steps, mode=interleave_mode,
        )


class _SkipTimestepsPlanMixin:
    """Step-skipping plan construction — model-family independent."""

    def build_plan(self, num_inference_steps, skip_timesteps=(), **_):
        if not skip_timesteps:
            return self.scheduler.build_plan(num_inference_steps)
        return plan_composers.skip_plan(self.scheduler, num_inference_steps, skip_timesteps)


@models_registry.add_to_registry("stable_diffusion_model_two_schedulers")
class StableDiffusionModelTwoSchedulers(_TwoSchedulersPlanMixin, StableDiffusionModel):
    """Scheduler-switching pipeline (reference models.py:338-730)."""


@models_registry.add_to_registry("stable_diffusion_model_interliving_schedulers")
class StableDiffusionModelInterlivingSchedulers(_InterlivingPlanMixin, StableDiffusionModel):
    """Interleaved-scheduler pipeline (reference models.py:733-1135)."""


@models_registry.add_to_registry("stable_diffusion_model_skip_timesteps")
class StableDiffusionModelSkipTimesteps(_SkipTimestepsPlanMixin, StableDiffusionModel):
    """Step-skipping pipeline (reference models.py:1138-1467)."""


@models_registry.add_to_registry("stable_diffusion_3_model_two_schedulers")
class StableDiffusion3ModelTwoSchedulers(_TwoSchedulersPlanMixin, StableDiffusion3Model):
    """SD3 scheduler-switching pipeline: the reference's two-scheduler
    experiment semantics (models.py:338-730) on the flow family — both
    schedulers must be flow-space (flow<->flow joins are well-defined;
    the composer's SPACE guard rejects flow<->VP mixes)."""


@models_registry.add_to_registry("stable_diffusion_3_model_interliving_schedulers")
class StableDiffusion3ModelInterlivingSchedulers(_InterlivingPlanMixin, StableDiffusion3Model):
    """SD3 interleaved-scheduler pipeline (ladder mode; flow<->flow)."""


@models_registry.add_to_registry("stable_diffusion_3_model_skip_timesteps")
class StableDiffusion3ModelSkipTimesteps(_SkipTimestepsPlanMixin, StableDiffusion3Model):
    """SD3 step-skipping pipeline (reference skip semantics on the flow
    sigma grid — skipped transitions simply absent)."""


@models_registry.add_to_registry("stable_diffusion_controlnet_model")
class StableDiffusionControlNetModel(StableDiffusionModel):
    """ControlNet-conditioned text->image pipeline (beyond-reference model
    family; models/controlnet.py).  Same engine, schedulers and metric
    protocol — the per-step delta is the ControlNet encoder copy whose
    zero-conv residuals the UNet injects at its skip states.
    """

    def __init__(
        self,
        pretrained_model: str = "runwayml/stable-diffusion-v1-5",
        image_size: int = 512,
        tiny: bool = False,
        dtype: str = "bfloat16",
        seed: int = 0,
        lora: str = None,
        variant: str = "auto",
        controlnet: str = None,  # local diffusers ControlNet snapshot dir
        controlnet_scale: float = 1.0,
        mesh_data: int = 0,
        mesh_seq: int = 1,
        mesh_model: int = 1,
        ip_adapter: str = None,
        ip_scale: float = 1.0,
        prompt_weighting: bool = False,
    ):
        self.controlnet_path = controlnet
        self.controlnet_scale = float(controlnet_scale)
        super().__init__(pretrained_model=pretrained_model, image_size=image_size,
                         tiny=tiny, dtype=dtype, seed=seed, lora=lora, variant=variant,
                         mesh_data=mesh_data, mesh_seq=mesh_seq, mesh_model=mesh_model,
                         ip_adapter=ip_adapter, ip_scale=ip_scale,
                         prompt_weighting=prompt_weighting)

    def _post_init(self) -> None:
        if self.controlnet_path and Path(self.controlnet_path).exists():
            from sonicdiffusionbayeslab_tpu.models.weights import load_controlnet_checkpoint

            self.controlnet_params = load_controlnet_checkpoint(
                self.controlnet_path, self.engine
            )
        else:
            # No local snapshot (offline env): random encoder + zero-init
            # heads — an exact no-op over the base UNet until trained.
            self.controlnet_params = self.engine.init_controlnet_params(
                seed=0, latent_hw=self.latent_hw
            )
        if self.mesh is not None:
            # _post_init runs after the base __init__'s shard_params pass;
            # the ControlNet tree needs the same mesh placement (its attn/ff
            # kernel names match the TP rules).
            from sonicdiffusionbayeslab_tpu.parallel import shard_params

            self.controlnet_params = shard_params(self.controlnet_params, self.mesh)
        self._control_call: Optional[Dict[str, Any]] = None

    def __call__(self, prompt, *args, control_image=None, controlnet_scale=None, **kw):
        """``control_image``: [B, H, W, 3] in [0,1] at pixel resolution
        (resized here if needed)."""
        if control_image is None:
            raise ValueError("stable_diffusion_controlnet_model requires control_image")
        img = jnp.asarray(control_image, jnp.float32)
        want_hw = (int(kw.get("height") or self.image_size),
                   int(kw.get("width") or self.image_size))
        if img.shape[1:3] != want_hw:
            img = jax.image.resize(
                img, (img.shape[0],) + want_hw + (img.shape[-1],), "bilinear"
            )
        self._control_call = {
            "params": self.controlnet_params,
            "image": img,
            "scale": self.controlnet_scale if controlnet_scale is None else float(controlnet_scale),
        }
        try:
            return super().__call__(prompt, *args, **kw)
        finally:
            self._control_call = None

    def _extra_sample_kwargs(self, batch: int, lat_hw) -> Dict[str, Any]:
        return {"control": self._control_call}
