"""The jitted sampling engine: one ``lax.scan`` denoise loop around the UNet.

This single function family replaces all four ~350-line reference pipelines
(src/models.py: StableDiffusionModel 21-335 and its TwoSchedulers /
Interliving / SkipTimesteps variants): their differences are entirely in the
:class:`SamplePlan` they run, never in compiled code.

Compile-count discipline (TPU-first): the plan's per-step arrays are
*traced inputs*, so one compiled denoise function serves every plan with the
same (num_steps, hist_depth, batch, latent shape, cfg-ness, noise-ness,
cache-ness) signature.  Timing mirrors the reference protocol exactly —
wall clock around the denoise loop only, excluding text encode and VAE
decode (src/models.py:208, 284-285) — via ``block_until_ready`` on the
jitted loop.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sonicdiffusionbayeslab_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from sonicdiffusionbayeslab_tpu.ops.attention import get_attention_backend
from sonicdiffusionbayeslab_tpu.ops.quant import get_quant_mode
from sonicdiffusionbayeslab_tpu.models.unet import UNet2DCondition, UNetConfig
from sonicdiffusionbayeslab_tpu.models.vae import AutoencoderKL, VAEConfig
from sonicdiffusionbayeslab_tpu.schedulers.plan import SamplePlan
from sonicdiffusionbayeslab_tpu.schedulers.runtime import SchedulerCarry, apply_row
from sonicdiffusionbayeslab_tpu.utils import rng as rng_util


@dataclasses.dataclass(frozen=True)
class CachePlan:
    """DeepCache schedule: step i runs the deep trunk iff ``full[i]``.

    Reference semantics (deep_cache.py:25-29 + the DeepCache package): the
    trunk is recomputed every ``cache_interval`` steps and replayed
    otherwise.  ``branch`` picks the split depth (down/up level) between the
    always-run shallow branch and the cached trunk — the reference sweeps
    only branch 0; deeper branches cache less and recompute more.
    """

    full: np.ndarray  # bool [L]
    branch: int = 0  # cache_branch_id: shallow/trunk split level

    @classmethod
    def every(cls, num_steps: int, cache_interval: int, branch: int = 0) -> "CachePlan":
        idx = np.arange(num_steps)
        return cls(full=(idx % int(cache_interval)) == 0, branch=int(branch))

    @classmethod
    def none(cls, num_steps: int) -> "CachePlan":
        return cls(full=np.ones(num_steps, bool))


@dataclasses.dataclass(frozen=True)
class SDXLTextConfigs:
    """The two SDXL text towers: CLIP ViT-L (penultimate states) + OpenCLIP
    bigG (penultimate states + projected pooled embedding)."""

    text1: CLIPTextConfig
    text2: CLIPTextConfig

    @classmethod
    def sdxl(cls) -> "SDXLTextConfigs":
        return cls(CLIPTextConfig.sd15(), CLIPTextConfig.sdxl_g())

    @classmethod
    def tiny(cls) -> "SDXLTextConfigs":
        return cls(
            CLIPTextConfig(vocab_size=1000, hidden_size=16, num_layers=2,
                           num_heads=2, intermediate_size=32),
            CLIPTextConfig.tiny_g(),
        )


def _gn_barrier_resolved() -> bool:
    """The GroupNorm conv/stats optimization-barrier default (models/layers.py):
    on for TPU unless SDBL_GN_BARRIER=0.  Resolved here so it can join the
    denoise trace-cache key."""
    v = os.environ.get("SDBL_GN_BARRIER",
                       "1" if jax.default_backend() == "tpu" else "")
    return bool(v and v != "0")


def guidance_scale_embedding(w: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding of (guidance_scale - 1) for w-conditioned (full
    LCM) UNets — diffusers get_guidance_scale_embedding: w scaled by 1000,
    half-sin/half-cos."""
    w = jnp.asarray(w, jnp.float32) * 1000.0
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-jnp.log(10000.0) / (half - 1)))
    emb = w[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


@dataclasses.dataclass
class SampleOutput:
    images: jax.Array  # [B, H, W, 3] in [0, 1]
    execution_time: float  # denoise-loop seconds (reference timing contract)
    x0_images: Optional[jax.Array]  # [S, n, h, w, 3]: per-step x0 decodes of the
    # first n samples (n = full batch by default — reference decodes the whole
    # captured batch, src/models.py:287-302; narrow via sample(x0_samples=...))
    latents: jax.Array  # final latents [B, h, w, 4]
    nfe: int


class StableDiffusionEngine:
    """Owns module definitions + the jit caches. Params are passed in (pure)."""

    def __init__(
        self,
        unet_config: UNetConfig = None,
        vae_config: VAEConfig = None,
        text_config: CLIPTextConfig = None,
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
    ):
        self.unet_config = unet_config or UNetConfig.sd15()
        self.vae_config = vae_config or VAEConfig.sd15()
        self.text_config = text_config or CLIPTextConfig.sd15()
        self.unet = UNet2DCondition(self.unet_config, dtype=dtype, param_dtype=param_dtype)
        self.vae = AutoencoderKL(self.vae_config, dtype=dtype, param_dtype=param_dtype)
        self.text = CLIPTextModel(self.text_config, dtype=dtype, param_dtype=param_dtype)
        # ControlNet module definition (params live outside init_params —
        # see init_controlnet_params; only the controlnet pipeline pays).
        from sonicdiffusionbayeslab_tpu.models.controlnet import ControlNet

        self.controlnet = ControlNet(self.unet_config, dtype=dtype, param_dtype=param_dtype)

    # ------------------------------------------------------------- params
    def init_params(self, seed: int = 0, latent_hw: int = 64) -> Dict[str, Any]:
        """Random-init parameter pytree (HF-weight loading: models/weights.py)."""
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        lat = jnp.zeros((1, latent_hw, latent_hw, self.unet_config.in_channels))
        ctx = jnp.zeros((1, self.text_config.max_length, self.unet_config.cross_attention_dim))
        ids = jnp.zeros((1, self.text_config.max_length), jnp.int32)
        added = None
        if self.unet_config.addition_time_embed_dim is not None:
            pooled_dim = (self.unet_config.projection_class_embeddings_input_dim
                          - 6 * self.unet_config.addition_time_embed_dim)
            added = {"text_embeds": jnp.zeros((1, pooled_dim)),
                     "time_ids": jnp.zeros((1, 6))}
        tcond = None
        if self.unet_config.time_cond_proj_dim is not None:
            tcond = jnp.zeros((1, self.unet_config.time_cond_proj_dim))
        return {
            "unet": self.unet.init(k1, lat, jnp.zeros((1,)), ctx, added,
                                   timestep_cond=tcond)["params"],
            "vae": self.vae.init(k2, lat, method=self.vae.init_all)["params"],
            "text": self.text.init(k3, ids)["params"],
        }

    def init_controlnet_params(self, seed: int = 0, latent_hw: int = 64) -> Dict[str, Any]:
        """Random-init ControlNet tree (zero convs start at exact no-op)."""
        lat = jnp.zeros((1, latent_hw, latent_hw, self.unet_config.in_channels))
        ctx = jnp.zeros((1, self.text_config.max_length, self.unet_config.cross_attention_dim))
        cond = jnp.zeros((1, latent_hw * 8, latent_hw * 8, 3))
        added = None
        if self.unet_config.addition_time_embed_dim is not None:  # SDXL family
            pooled_dim = (self.unet_config.projection_class_embeddings_input_dim
                          - 6 * self.unet_config.addition_time_embed_dim)
            added = {"text_embeds": jnp.zeros((1, pooled_dim)),
                     "time_ids": jnp.zeros((1, 6))}
        return self.controlnet.init(
            jax.random.PRNGKey(seed ^ 0xC0), lat, jnp.zeros((1,)), ctx, cond,
            1.0, added,
        )["params"]

    def init_ip_params(self, seed: int = 0, latent_hw: int = 64,
                       embed_dim: int = 1024, num_tokens: int = 4) -> Dict[str, Any]:
        """Random-init IP-Adapter trees: a UNet tree INCLUDING the decoupled
        to_k_ip/to_v_ip projections plus the image-projection head
        (models/ip_adapter.py; real checkpoints load via load_ip_adapter +
        merge_ip_params)."""
        from sonicdiffusionbayeslab_tpu.models.ip_adapter import ImageProjection

        k1, k2 = jax.random.split(jax.random.PRNGKey(seed ^ 0x1BAD), 2)
        lat = jnp.zeros((1, latent_hw, latent_hw, self.unet_config.in_channels))
        ctx = jnp.zeros((1, self.text_config.max_length, self.unet_config.cross_attention_dim))
        ip_ctx = jnp.zeros((1, num_tokens, self.unet_config.cross_attention_dim))
        added = None
        if self.unet_config.addition_time_embed_dim is not None:  # SDXL family
            pooled_dim = (self.unet_config.projection_class_embeddings_input_dim
                          - 6 * self.unet_config.addition_time_embed_dim)
            added = {"text_embeds": jnp.zeros((1, pooled_dim)),
                     "time_ids": jnp.zeros((1, 6))}
        unet_tree = self.unet.init(k1, lat, jnp.zeros((1,)), ctx, added,
                                   ip_context=ip_ctx)["params"]
        proj = ImageProjection(
            self.unet_config.cross_attention_dim, num_tokens,
            dtype=self.unet.dtype, param_dtype=self.unet.param_dtype,
        ).init(k2, jnp.zeros((1, embed_dim)))["params"]
        return {"unet": unet_tree, "image_proj": proj}

    @functools.lru_cache(maxsize=8)
    def _image_proj_fn(self, num_tokens: int):
        from sonicdiffusionbayeslab_tpu.models.ip_adapter import ImageProjection

        mod = ImageProjection(
            self.unet_config.cross_attention_dim, num_tokens,
            dtype=self.unet.dtype, param_dtype=self.unet.param_dtype,
        )

        @jax.jit
        def project(proj_params, image_embeds):
            return mod.apply({"params": proj_params}, image_embeds)

        return project

    # ------------------------------------------------------------- encode
    @functools.cached_property
    def encode_fn(self):
        @jax.jit
        def encode(text_params, input_ids):
            return self.text.apply({"params": text_params}, input_ids)["last_hidden_state"]

        return encode

    def encode_prompts(self, params, input_ids: np.ndarray) -> jax.Array:
        return self.encode_fn(params["text"], jnp.asarray(input_ids))

    # ------------------------------------------------------------- decode
    @functools.cached_property
    def decode_fn(self):
        @jax.jit
        def decode(vae_params, latents):
            img = self.vae.apply({"params": vae_params}, latents, method=self.vae.decode)
            return jnp.clip(img / 2 + 0.5, 0.0, 1.0)

        return decode

    # ------------------------------------------------------------- encode (img2img)
    @functools.cached_property
    def encode_image_fn(self):
        @jax.jit
        def encode(vae_params, images, rng):
            """images [B, H, W, 3] in [0, 1] -> scaled latents [B, h, w, 4]."""
            x = images * 2.0 - 1.0
            return self.vae.apply(
                {"params": vae_params}, x, rng, method=self.vae.encode_sample
            )

        return encode

    # ------------------------------------------------------------ denoise
    @functools.lru_cache(maxsize=64)
    def _denoise_fn(
        self,
        num_steps: int,
        hist_depth: int,
        has_saved: bool,
        needs_noise: bool,
        do_cfg: bool,
        use_rescale: bool,
        use_cache: bool,
        collect_x0: bool,
        cache_branch: int = 0,
        init_scale: float = 1.0,
        use_blend: bool = False,
        x0_count: int = 1,
        has_added: bool = False,  # SDXL text_time conditioning present
        use_control: bool = False,  # ControlNet residual injection
        use_ip: bool = False,  # IP-Adapter decoupled cross-attention
        use_tcond: bool = False,  # w-embedding conditioning (full LCM UNets)
        # Perf knobs (docs/PERF.md). Passed as arguments — not read from the
        # environment at trace time — so they participate in the lru_cache
        # key and toggling SDBL_SCAN_UNROLL / SDBL_DONATE mid-process takes
        # effect instead of silently hitting a stale cached trace.
        unroll: int = 1,
        donate: bool = False,
        # UNet micro-batching (SDBL_UNET_MICROBATCH=k / inference.
        # unet_microbatch): run the (CFG-doubled) UNet batch as k sequential
        # chunks via lax.map inside the scan body.  Peak activation memory
        # divides by k with ZERO recompute — the fix for the reference's
        # batch-32 protocol point, where one 64-wide UNet forward forces XLA
        # into heavy rematerialization (docs/PERF.md round-3 notes).  Chunks
        # stay MXU-efficient down to ~batch 8.
        microbatch: int = 0,
        # CFG shared prefix (SDBL_CFG_PREFIX=1): the two CFG halves are
        # bit-identical until the first cross-attention, so the UNet computes
        # the prefix once at batch B and tiles at the divergence point
        # (models/unet.py cfg_shared_prefix).  Exact same math, ~the first
        # self-attention + leading convs deduplicated.
        cfg_prefix: bool = False,
        # Token Merging (ops/tome.py TomeConfig — hashable, so it keys the
        # trace cache): merge the most redundant tokens around the UNet's
        # self-attentions.  APPROXIMATE (unlike cfg_prefix/microbatch):
        # trades a paper-quantified quality delta for a large cut in the
        # N=4096 attention (the profile's biggest bucket, docs/PERF.md).
        tome=None,
        # Cache-key-only entries: the attention backend and GroupNorm
        # barrier are read from env/registry at TRACE time inside the
        # model code; carrying the resolved values here keeps a mid-process
        # toggle from silently hitting a stale cached trace (same fix as
        # unroll/donate above).
        attn_backend=None,
        gn_barrier: bool = False,
        # Cache-key-only: int8 W8A8 projections (ops/quant.py, APPROXIMATE),
        # resolved from SDBL_QUANT at trace time inside models/layers.py.
        quant=None,
    ):
        unet = self.unet
        controlnet = self.controlnet

        def denoise(unet_params, latents0, embeds, plan_xs, guidance, rescale, key,
                    sample_idx=None,
                    blend_mask=None, blend_source=None, blend_noise=None,
                    added_text=None, added_ids=None,
                    control_params=None, control_hint=None, control_scale=None,
                    ip_tokens=None, ip_scale=None, timestep_cond=None):
            """latents0 [B,h,w,4] fp32; embeds [2B or B, T, C]; plan_xs dict of [L,...].

            Inpainting (use_blend): after each scheduler step the kept
            region (mask == 0) is overwritten with the source latents
            re-noised to that row's output level (legacy masked-img2img;
            plan_xs carries per-row blend_a / blend_s)."""

            added = (
                {"text_embeds": added_text, "time_ids": added_ids} if has_added else None
            )
            ip_kw = {"ip_context": ip_tokens, "ip_scale": ip_scale} if use_ip else {}
            if use_tcond:
                ip_kw["timestep_cond"] = timestep_cond

            def body(carry, xs):
                sched: SchedulerCarry = carry["sched"]
                lat = sched.latents
                # Model-input scaling (scale_model_input; 1.0 for VP plans).
                lat_model = lat * xs["in_scale"]
                if cfg_prefix and do_cfg:
                    # Shared-prefix mode: hand the UNet the SINGLE copy; it
                    # tiles to 2B at the first cross-attention itself.
                    lat_in = lat_model.astype(unet.dtype)
                else:
                    lat_in = jnp.concatenate([lat_model, lat_model]) if do_cfg else lat_model
                    lat_in = lat_in.astype(unet.dtype)

                tb = jnp.broadcast_to(xs["timestep"], (lat_in.shape[0],))

                def mb_chunk(x):
                    MB = lat_in.shape[0]
                    if MB % microbatch:
                        raise ValueError(
                            f"unet_microbatch {microbatch} must divide the "
                            f"model batch {MB}"
                        )
                    return x.reshape((microbatch, MB // microbatch) + x.shape[1:])

                def mb_merge(x):
                    return x.reshape((lat_in.shape[0],) + x.shape[2:])

                if use_cache and microbatch > 1:
                    # DeepCache x micro-batching: the cache tensor is batch-
                    # leading, so it chunks exactly like the latents; each
                    # chunk's deep trunk / shallow pass runs at the memory-
                    # friendly chunk width.
                    base = {
                        "lat": mb_chunk(lat_in), "tb": mb_chunk(tb),
                        "emb": mb_chunk(embeds),
                    }
                    if has_added:
                        base["added_text"] = mb_chunk(added["text_embeds"])
                        base["added_ids"] = mb_chunk(added["time_ids"])
                    if use_tcond:
                        base["tcond"] = mb_chunk(ip_kw["timestep_cond"])

                    def chunk_added(c):
                        return (
                            {"text_embeds": c["added_text"], "time_ids": c["added_ids"]}
                            if has_added else None
                        )

                    def chunk_kw(c):
                        return {"timestep_cond": c["tcond"]} if use_tcond else {}

                    def full(c):
                        def one(a):
                            return unet.apply(
                                {"params": unet_params}, a["lat"], a["tb"], a["emb"],
                                chunk_added(a), return_cache=True,
                                cache_branch_id=cache_branch, tome=tome,
                                **chunk_kw(a),
                            )

                        preds, caches = jax.lax.map(one, base)
                        return mb_merge(preds), mb_merge(caches)

                    def cached(c):
                        def one(a):
                            return unet.apply(
                                {"params": unet_params}, a["lat"], a["tb"], a["emb"],
                                chunk_added(a), cache=a["cache"],
                                cache_branch_id=cache_branch, tome=tome,
                                **chunk_kw(a),
                            )

                        preds = jax.lax.map(one, {**base, "cache": mb_chunk(c)})
                        return mb_merge(preds), c

                    noise_pred, new_cache = jax.lax.cond(
                        xs["cache_full"] > 0, full, cached, carry["cache"]
                    )
                elif use_cache:
                    def full(c):
                        return unet.apply(
                            {"params": unet_params}, lat_in, tb, embeds, added,
                            return_cache=True, cache_branch_id=cache_branch,
                            tome=tome, **ip_kw,
                        )

                    def cached(c):
                        return (
                            unet.apply({"params": unet_params}, lat_in, tb, embeds, added,
                                       cache=c, cache_branch_id=cache_branch,
                                       tome=tome, **ip_kw),
                            c,
                        )

                    noise_pred, new_cache = jax.lax.cond(
                        xs["cache_full"] > 0, full, cached, carry["cache"]
                    )
                elif use_control:
                    # ControlNet rides every step: encoder copy + zero convs
                    # produce the residuals the UNet injects at its skips.
                    residuals = controlnet.apply(
                        {"params": control_params}, lat_in, tb, embeds,
                        control_hint, control_scale, added,
                    )
                    noise_pred = unet.apply(
                        {"params": unet_params}, lat_in, tb, embeds, added,
                        control_residuals=residuals, tome=tome, **ip_kw,
                    )
                    new_cache = None
                elif microbatch > 1:
                    # Chunked UNet: lax.map serializes k sub-batches, so the
                    # live activation set is one chunk's, not the full
                    # batch's.  Per-chunk batch-shaped operands ride along;
                    # embeds/added/tcond are chunked, everything else closes
                    # over.  (Control/IP paths keep the plain call —
                    # guarded at the sample() entry.)
                    chunk_args = {
                        "lat": mb_chunk(lat_in),
                        "tb": mb_chunk(tb),
                        "emb": mb_chunk(embeds),
                    }
                    if has_added:
                        chunk_args["added_text"] = mb_chunk(added["text_embeds"])
                        chunk_args["added_ids"] = mb_chunk(added["time_ids"])
                    if use_tcond:
                        chunk_args["tcond"] = mb_chunk(ip_kw["timestep_cond"])

                    def one_chunk(c):
                        a = (
                            {"text_embeds": c["added_text"], "time_ids": c["added_ids"]}
                            if has_added else None
                        )
                        kw = {"timestep_cond": c["tcond"]} if use_tcond else {}
                        return unet.apply(
                            {"params": unet_params}, c["lat"], c["tb"], c["emb"], a,
                            tome=tome, **kw
                        )

                    noise_pred = mb_merge(jax.lax.map(one_chunk, chunk_args))
                    new_cache = None
                elif cfg_prefix and do_cfg:
                    noise_pred = unet.apply({"params": unet_params}, lat_in, tb, embeds,
                                            added, cfg_shared_prefix=True, tome=tome)
                    new_cache = None
                else:
                    noise_pred = unet.apply({"params": unet_params}, lat_in, tb, embeds,
                                            added, tome=tome, **ip_kw)
                    new_cache = None

                noise_pred = noise_pred.astype(jnp.float32)
                if do_cfg:
                    eps_u, eps_t = jnp.split(noise_pred, 2, axis=0)
                    eps = eps_u + guidance * (eps_t - eps_u)
                    if use_rescale:
                        # Rescale CFG (Lin et al. 2023 §3.4; reference
                        # rescale_noise_cfg path, src/models.py:238-250).
                        std_t = jnp.std(eps_t, axis=(1, 2, 3), keepdims=True)
                        std_c = jnp.std(eps, axis=(1, 2, 3), keepdims=True)
                        eps = rescale * (eps * std_t / std_c) + (1 - rescale) * eps
                else:
                    eps = noise_pred

                noise = None
                key_out = carry["key"]
                if needs_noise:
                    key_out, sub = jax.random.split(carry["key"])
                    # Per-sample streams: ancestral noise is keyed by the
                    # sample's identity (sample_idx), not its row position,
                    # so batch composition never changes a request's image —
                    # the same guarantee per_sample_latents gives the initial
                    # latents (serving/batcher.py contract).
                    noise = jax.vmap(
                        lambda si: jax.random.normal(
                            jax.random.fold_in(sub, si), lat.shape[1:], jnp.float32
                        )
                    )(sample_idx)
                new_sched, x0 = apply_row(sched, eps, xs, noise)
                if use_blend:
                    target = xs["blend_a"] * blend_source + xs["blend_s"] * blend_noise
                    blended = blend_mask * new_sched.latents + (1.0 - blend_mask) * target
                    new_sched = new_sched._replace(latents=blended)

                out_carry = {"sched": new_sched, "key": key_out}
                if use_cache:
                    out_carry["cache"] = new_cache
                return out_carry, (x0[:x0_count] if collect_x0 else None)

            carry0: Dict[str, Any] = {"sched": init_carry_static(latents0), "key": key}
            if use_cache:
                b = latents0.shape[0] * (2 if do_cfg else 1)
                h, w = latents0.shape[1], latents0.shape[2]
                carry0["cache"] = jnp.zeros(
                    (b,) + unet.cache_shape(h, w, cache_branch), unet.dtype
                )
            carry, x0_seq = jax.lax.scan(body, carry0, plan_xs, unroll=unroll)
            return carry["sched"].latents, x0_seq

        def init_carry_static(latents0):
            lat = latents0.astype(jnp.float32)
            if init_scale != 1.0:  # sigma-space samplers (init_noise_sigma)
                lat = lat * init_scale
            hist = jnp.zeros((hist_depth,) + lat.shape, jnp.float32)
            saved = jnp.zeros_like(lat) if has_saved else None
            return SchedulerCarry(lat, hist, saved)

        if donate:
            # Perf experiment (VERDICT r1 item 6c): donate the initial
            # latents so XLA may alias them into the scan carry. Measured on
            # hardware in docs/PERF.md. sample() copies caller-supplied
            # init_latents before the call so donation never invalidates a
            # user-owned buffer.
            return jax.jit(denoise, donate_argnums=(1,))
        return jax.jit(denoise)

    # ------------------------------------------------------------- sample
    def sample(
        self,
        params: Dict[str, Any],
        plan: SamplePlan,
        prompt_embeds: jax.Array,  # [B, T, C]
        negative_embeds: Optional[jax.Array],  # [B, T, C] or None
        key: jax.Array,
        sample_indices: Optional[np.ndarray] = None,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        cache_plan: Optional[CachePlan] = None,
        latent_hw: Tuple[int, int] = (64, 64),
        collect_x0: bool = False,
        x0_decode: bool = True,  # False: keep x0 in the scan, skip decodes (perf isolation)
        x0_samples: Optional[int] = None,  # None = full batch (reference contract)
        decode: bool = True,
        mesh=None,
        init_latents: Optional[jax.Array] = None,  # img2img: pre-noised seed
        # Inpainting: (mask [B,h,w,1] 1=regenerate, source latents [B,h,w,4],
        # blend_a [R], blend_s [R]) — see _PlanBuilder.blend_schedule.
        blend: Optional[Tuple[jax.Array, jax.Array, np.ndarray, np.ndarray]] = None,
        # SDXL text_time conditioning: {"text_embeds" [B,P] (positive pooled),
        # "negative_text_embeds" [B,P] (CFG), "time_ids" [B,K]}.
        added_cond: Optional[Dict[str, jax.Array]] = None,
        # ControlNet: {"params": tree, "image": [B, 8h, 8w, 3] in [0,1],
        # "scale": float (conditioning_scale, default 1.0)}.
        control: Optional[Dict[str, Any]] = None,
        # IP-Adapter: {"image_embeds": [B, E] CLIP image embedding,
        # "scale": float}. params must contain "image_proj" and a UNet tree
        # with the to_k_ip/to_v_ip projections merged (merge_ip_params).
        ip_adapter: Optional[Dict[str, Any]] = None,
        # Token Merging (ToMe, ops/tome.py): ratio in (0,1) merges that
        # fraction of tokens around the UNet's N=4096 self-attentions
        # (approximate acceleration, DeepCache's product family).  Either a
        # float ratio or a full TomeConfig; env default SDBL_TOME_RATIO.
        tome: Any = None,
        # UNet micro-batching (config inference.unet_microbatch; env default
        # SDBL_UNET_MICROBATCH): run the CFG-doubled UNet batch as k
        # sequential chunks inside the scan — the batch-32 protocol fix
        # (docs/PERF.md).  EXACT math, peak memory / k, zero recompute.
        microbatch: Optional[int] = None,
        # False: skip the denoise-loop hard sync (block + one-element host
        # read).  The reference timing contract needs the sync; a serving
        # caller does not — it serializes a full host<->device round trip
        # between the scan and the VAE decode dispatch, stalling the
        # worker thread for the whole denoise instead of letting decode +
        # quantize + the NEXT batch's dispatch queue asynchronously
        # (serving/batcher.py pipeline_depth).  execution_time is then
        # reported as -1.0 ("not timed").
        time_loop: bool = True,
    ) -> SampleOutput:
        """Generate images for one batch. Returns reference-contract output:
        (images, execution_time of the denoise loop only, optional x0 decodes)
        — cf. src/models.py:329-335."""
        B = int(prompt_embeds.shape[0])
        do_cfg = guidance_scale > 1.0 and negative_embeds is not None
        embeds = (
            jnp.concatenate([negative_embeds, prompt_embeds]) if do_cfg else prompt_embeds
        )

        if sample_indices is None:
            sample_indices = np.arange(B)
        lat_shape = (latent_hw[0], latent_hw[1], self.unet_config.in_channels)
        if init_latents is not None:  # img2img: caller noised to plan start
            latents0 = jnp.asarray(init_latents, jnp.float32)
            if latents0.shape != (B,) + lat_shape:
                raise ValueError(f"init_latents {latents0.shape} != {(B,) + lat_shape}")
        else:
            latents0 = rng_util.per_sample_latents(
                key, jnp.asarray(sample_indices, jnp.int32), lat_shape
            )

        if mesh is not None:
            # Batch over 'data', latent spatial height over 'seq' (context
            # parallelism — GSPMD inserts conv halo exchanges and attention
            # gathers); params are placed by the caller via
            # parallel.shard_params.  GSPMD propagates everything else.
            from sonicdiffusionbayeslab_tpu.parallel import shard_batch, shard_latents

            n_data = mesh.shape.get("data", 1)
            if B % n_data:
                raise ValueError(f"batch {B} not divisible by data axis {n_data}")
            latents0 = shard_latents(mesh, latents0)
            embeds = shard_batch(mesh, embeds)

        xs = {k: jnp.asarray(v) for k, v in plan.scan_xs().items()}
        use_cache = cache_plan is not None
        if use_cache:
            if len(cache_plan.full) != plan.num_steps:
                raise ValueError("cache plan length != plan length")
            if not cache_plan.full[0]:
                raise ValueError("first step must compute the deep trunk")
            xs["cache_full"] = jnp.asarray(cache_plan.full, jnp.float32)

        blend_args = {}
        if blend is not None:
            mask, source, blend_a, blend_s = blend
            if len(blend_a) != plan.num_steps or len(blend_s) != plan.num_steps:
                raise ValueError("blend schedule length != plan length")
            xs["blend_a"] = jnp.asarray(blend_a, jnp.float32)
            xs["blend_s"] = jnp.asarray(blend_s, jnp.float32)
            blend_args = dict(
                blend_mask=jnp.asarray(mask, jnp.float32),
                blend_source=jnp.asarray(source, jnp.float32),
                blend_noise=jax.random.normal(
                    jax.random.fold_in(key, 0xB1E0D), latents0.shape, jnp.float32
                ),
            )

        control_args = {}
        if control is not None:
            if use_cache:
                raise ValueError("ControlNet cannot be combined with DeepCache")
            hint = jnp.asarray(control["image"], jnp.float32)
            want = (B, latent_hw[0] * 8, latent_hw[1] * 8, 3)
            if hint.shape != want:
                raise ValueError(f"control image {hint.shape} != {want}")
            if do_cfg:
                hint = jnp.concatenate([hint, hint])
            control_args = dict(
                control_params=control["params"],
                control_hint=hint,
                control_scale=jnp.float32(control.get("scale", 1.0)),
            )

        tcond_args = {}
        use_tcond = self.unet_config.time_cond_proj_dim is not None
        if use_tcond:
            # w-conditioned UNet (full LCM): embed guidance_scale - 1 for
            # every row of the (possibly CFG-doubled) model batch.
            n_rows = B * (2 if do_cfg else 1)
            w_emb = guidance_scale_embedding(
                jnp.full((n_rows,), guidance_scale - 1.0, jnp.float32),
                self.unet_config.time_cond_proj_dim,
            )
            tcond_args = dict(timestep_cond=w_emb)

        if microbatch is None:
            microbatch = int(os.environ.get("SDBL_UNET_MICROBATCH", "0"))
        microbatch = int(microbatch)
        if microbatch > 1 and (control is not None or ip_adapter is not None):
            raise ValueError(
                "SDBL_UNET_MICROBATCH composes with the plain/SDXL/LCM/"
                "DeepCache UNet paths only (not ControlNet/IP-Adapter)"
            )

        ip_args = {}
        if ip_adapter is not None:
            if "image_proj" not in params:
                raise ValueError("ip_adapter needs params['image_proj'] (load_ip_adapter)")
            embeds_img = jnp.asarray(ip_adapter["image_embeds"], jnp.float32)
            if embeds_img.shape[0] != B:
                raise ValueError(f"image_embeds batch {embeds_img.shape[0]} != {B}")
            proj_kernel = params["image_proj"]["proj"]["kernel"]
            num_tokens = int(proj_kernel.shape[1]) // self.unet_config.cross_attention_dim
            project = self._image_proj_fn(num_tokens)
            tokens = project(params["image_proj"], embeds_img)
            if do_cfg:
                # Unconditional branch conditions on the ZERO image embedding
                # (IP-Adapter convention), matching the [neg|pos] concat.
                tokens_u = project(params["image_proj"], jnp.zeros_like(embeds_img))
                tokens = jnp.concatenate([tokens_u, tokens])
            ip_args = dict(
                ip_tokens=tokens,
                ip_scale=jnp.float32(ip_adapter.get("scale", 1.0)),
            )

        added_args = {}
        if added_cond is not None:
            pos = jnp.asarray(added_cond["text_embeds"])
            ids = jnp.asarray(added_cond["time_ids"])
            if do_cfg:
                neg = jnp.asarray(
                    added_cond.get("negative_text_embeds", jnp.zeros_like(pos))
                )
                pos = jnp.concatenate([neg, pos])
                ids = jnp.concatenate([ids, ids])
            added_args = dict(added_text=pos, added_ids=ids)

        donate = bool(os.environ.get("SDBL_DONATE"))
        if tome is None and os.environ.get("SDBL_TOME_RATIO"):
            tome = float(os.environ["SDBL_TOME_RATIO"])
        if tome is not None and not hasattr(tome, "r_for"):
            from sonicdiffusionbayeslab_tpu.ops.tome import TomeConfig

            tome = TomeConfig(ratio=float(tome)) if float(tome) > 0 else None
        # CFG shared prefix: a pure perf knob (identical math), so it simply
        # does not engage on paths it cannot deduplicate.
        cfg_prefix = (
            bool(os.environ.get("SDBL_CFG_PREFIX"))
            and do_cfg
            and not use_cache
            and control is None
            and ip_adapter is None
            and added_cond is None
            and not use_tcond
            and microbatch <= 1
        )
        fn = self._denoise_fn(
            plan.num_steps,
            plan.hist_depth,
            plan.has_saved,
            plan.needs_noise,
            do_cfg,
            guidance_rescale > 0.0,
            use_cache,
            collect_x0,
            cache_plan.branch if use_cache else 0,
            float(plan.init_scale),
            blend is not None,
            B if x0_samples is None else max(1, min(int(x0_samples), B)),
            added_cond is not None,
            control is not None,
            ip_adapter is not None,
            use_tcond,
            int(os.environ.get("SDBL_SCAN_UNROLL", "1")),
            donate,
            microbatch,
            cfg_prefix,
            tome,
            get_attention_backend(),
            _gn_barrier_resolved(),
            get_quant_mode(),
        )
        if donate and init_latents is not None:
            # Donation would invalidate the caller's buffer; give XLA a copy.
            latents0 = jnp.array(latents0, jnp.float32, copy=True)

        step_key = jax.random.fold_in(key, 0x5EED)
        # Reference timing contract: wall clock around the denoise loop only.
        t0 = time.perf_counter()
        latents, x0_seq = fn(
            params["unet"],
            latents0,
            embeds,
            xs,
            jnp.float32(guidance_scale),
            jnp.float32(guidance_rescale),
            step_key,
            sample_idx=jnp.asarray(sample_indices, jnp.int32),
            **blend_args,
            **added_args,
            **control_args,
            **ip_args,
            **tcond_args,
        )
        if time_loop:
            latents = jax.block_until_ready(latents)
            # On async remote backends (axon tunnel) block_until_ready can
            # return before execution completes; a one-element host read is
            # the only honest sync, so the timed region ends with one.
            _ = jax.device_get(latents[(0,) * latents.ndim])
            execution_time = time.perf_counter() - t0
        else:
            execution_time = -1.0  # not timed: async dispatch path

        if os.environ.get("SDBL_CHECK_NANS"):
            # Sanitizer mode (SURVEY §5): fail loudly on non-finite latents
            # with enough context to bisect the plan.
            if not bool(jnp.isfinite(latents).all()):
                raise FloatingPointError(
                    f"non-finite latents after plan {plan.name!r} "
                    f"(guidance={guidance_scale}, steps={plan.num_steps})"
                )

        images = self.decode_fn(params["vae"], latents) if decode else None
        x0_images = None
        if collect_x0 and not x0_decode:
            # Raw x0 latents kept in the scan outputs but not decoded —
            # the cost-isolation knob behind docs/PERF.md's protocol-gap
            # decomposition (scan-output cost vs per-step decode cost).
            pass
        elif collect_x0:
            # x0_seq: [S, n, h, w, 4]. Decode per step (the reference's
            # shape, src/models.py:287-302): S dispatches of batch n through
            # ONE compiled decode — a single flattened [S*n] decode at the
            # 1000-prompt protocol scale (20 steps x batch 32) would need
            # ~51 GB just for the decoder's mid-attention scores.
            x0_images = jnp.stack(
                [self.decode_fn(params["vae"], x0_seq[i])
                 for i in range(x0_seq.shape[0])]
            )
        return SampleOutput(
            images=images,
            execution_time=execution_time,
            x0_images=x0_images,
            latents=latents,
            nfe=plan.nfe,
        )


class SDXLEngine(StableDiffusionEngine):
    """SDXL-family engine: SDXL UNet (per-level transformer depth, text_time
    micro-conditioning) + dual text towers (CLIP ViT-L + OpenCLIP bigG).

    Beyond-reference model family (the reference is SD-1.5-only); the
    sampling loop, schedulers, DeepCache, sharding, img2img/inpainting and
    metrics all apply unchanged — SDXL differs only in the modules and the
    ``added_cond`` micro-conditioning handed to :meth:`sample`.
    """

    def __init__(
        self,
        unet_config: UNetConfig = None,
        vae_config: VAEConfig = None,
        text_configs: "SDXLTextConfigs" = None,
        dtype=jnp.bfloat16,
        param_dtype=jnp.bfloat16,
    ):
        from sonicdiffusionbayeslab_tpu.models.vae import VAEConfig as _V

        tc = text_configs or SDXLTextConfigs.sdxl()
        super().__init__(
            unet_config or UNetConfig.sdxl(),
            vae_config or _V.sdxl(),
            tc.text1,
            dtype=dtype,
            param_dtype=param_dtype,
        )
        self.text2_config = tc.text2
        self.text2 = CLIPTextModel(self.text2_config, dtype=dtype, param_dtype=param_dtype)

    def init_params(self, seed: int = 0, latent_hw: int = 128) -> Dict[str, Any]:
        params = super().init_params(seed=seed, latent_hw=latent_hw)
        k4, k5 = jax.random.split(jax.random.PRNGKey(seed ^ 0x5D31), 2)
        ids = jnp.zeros((1, self.text2_config.max_length), jnp.int32)
        params["text2"] = self.text2.init(k4, ids)["params"]
        # OpenCLIP text projection (CLIPTextModelWithProjection.text_projection).
        h2 = self.text2_config.hidden_size
        params["text2_proj"] = {
            "kernel": jax.random.normal(k5, (h2, h2), jnp.float32) * (h2 ** -0.5)
        }
        return params

    @functools.cached_property
    def encode_xl_fn(self):
        @jax.jit
        def encode(text_p, text2_p, proj, ids1, ids2):
            o1 = self.text.apply({"params": text_p}, ids1)
            o2 = self.text2.apply({"params": text2_p}, ids2)
            # SDXL conditions on the PENULTIMATE hidden states of both towers
            # (clip-skip convention), concatenated on the feature axis; the
            # pooled embedding is bigG's EOT state through text_projection.
            ctx = jnp.concatenate(
                [o1["penultimate_hidden_state"], o2["penultimate_hidden_state"]],
                axis=-1,
            )
            pooled = o2["pooled_output"] @ proj["kernel"]
            return ctx, pooled

        return encode

    def encode_prompts_xl(self, params, ids1: np.ndarray, ids2: np.ndarray):
        """-> (context [B, T, 2048], pooled [B, 1280])."""
        return self.encode_xl_fn(
            params["text"], params["text2"], params["text2_proj"],
            jnp.asarray(ids1), jnp.asarray(ids2),
        )
