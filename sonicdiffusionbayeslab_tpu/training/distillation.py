"""Latent-consistency distillation (LCM / LCM-LoRA training).

Luo et al. 2023: distill a guided diffusion teacher into a consistency
model that samples in 1-8 steps.  This is the trainer that CREATES the
LCM-LoRA adapters the reference's consistency-model method merely downloads
and fuses (reference src/experiments/consistency_model.py:20-21) — closing
the loop: distill here, sample with ``lcm_scheduler``'s plan
(schedulers/lcm.py, same c_skip/c_out boundary scalings).

One jitted step does everything:

  z_t   = alpha_t x + sigma_t eps                 (forward noising at a
                                                   distillation-grid node)
  eps_w = eps_c + w (eps_c - eps_u)               (teacher CFG, frozen)
  z_s   = DDIM(z_t -> s) under eps_w              (one solver step down the
                                                   grid, k = T/N timesteps)
  f_on  = c_skip(t) z_t + c_out(t) x0_student(z_t, t)
  f_tg  = c_skip(s) z_s + c_out(s) x0_target(z_s, s)   (EMA target network,
                                                        stop-gradient)
  loss  = huber(f_on - f_tg)

The student defaults to LoRA adapters over the frozen teacher (LCM-LoRA);
``lora_rank=0`` distills a full UNet copy instead.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sonicdiffusionbayeslab_tpu.schedulers.schedule import NoiseSchedule, ScheduleConfig
from sonicdiffusionbayeslab_tpu.training.lora import DEFAULT_TARGETS, apply_lora, init_lora
from sonicdiffusionbayeslab_tpu.training.trainer import TrainState


@dataclasses.dataclass(frozen=True)
class LCMDistillConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    # Consistency-distillation knobs (diffusers LCM training conventions).
    guidance_scale: float = 7.5  # fixed w (LCM-LoRA style; no w-embedding)
    original_inference_steps: int = 50  # N distillation-grid nodes
    timestep_scaling: float = 10.0
    sigma_data: float = 0.5
    huber_c: float = 0.001
    # Donate the TrainState into the jitted step (in-place update of the
    # 5 param-sized full-student trees instead of double-buffering them).
    # Old states are invalid after a step on TPU/GPU — reassign
    # `state = distill_step(state, ...)`; set False to re-step from a
    # retained state (probing/debug).
    donate: bool = True
    ema_decay: float = 0.95  # target-network EMA
    # Student parameterization: LoRA rank (0 = full UNet copy).
    lora_rank: int = 64
    lora_targets: str = DEFAULT_TARGETS
    lora_scale: float = 1.0
    # Full-LCM recipe (Luo et al. 2023 complete form): sample w uniformly in
    # [w_min, w_max] per example and condition the student on it through a
    # time_cond_proj_dim-wide guidance embedding (requires lora_rank == 0;
    # the student gains a zero-init cond_proj so step 0 still matches the
    # teacher). None = fixed-w LCM-LoRA style above.
    w_min: Optional[float] = None
    w_max: Optional[float] = None
    student_time_cond_proj_dim: Optional[int] = None


class LCMDistiller:
    """Builds and caches the jitted consistency-distillation step."""

    def __init__(
        self,
        engine,
        config: LCMDistillConfig = LCMDistillConfig(),
        schedule_config: ScheduleConfig = None,
    ):
        self.engine = engine
        self.config = config
        self.schedule = NoiseSchedule.create(schedule_config or ScheduleConfig())
        if self.schedule.config.prediction_type != "epsilon":
            raise ValueError("LCM distillation implemented for epsilon-prediction teachers")
        T = self.schedule.config.num_train_timesteps
        N = config.original_inference_steps
        if T % N:
            raise ValueError(f"num_train_timesteps {T} not divisible by grid {N}")
        self.w_conditioned = config.student_time_cond_proj_dim is not None
        if self.w_conditioned:
            import dataclasses as _dc

            if config.lora_rank > 0:
                raise ValueError(
                    "w-conditioned distillation needs a full student "
                    "(lora_rank=0): the cond_proj has no teacher counterpart"
                )
            if (config.w_min is None) != (config.w_max is None):
                raise ValueError("set both w_min and w_max (or neither)")
            from sonicdiffusionbayeslab_tpu.models.unet import UNet2DCondition

            self.student_unet = UNet2DCondition(
                _dc.replace(engine.unet_config,
                            time_cond_proj_dim=config.student_time_cond_proj_dim),
                dtype=engine.unet.dtype, param_dtype=engine.unet.param_dtype,
            )
        elif config.w_min is not None or config.w_max is not None:
            raise ValueError("w sampling requires student_time_cond_proj_dim")
        self.k = T // N
        # Ascending distillation grid: t_i = (i+1)*k - 1 (diffusers ddim_timesteps).
        self.grid = np.arange(1, N + 1, dtype=np.int64) * self.k - 1
        chain = []
        if config.max_grad_norm and config.max_grad_norm > 0:
            chain.append(optax.clip_by_global_norm(config.max_grad_norm))
        chain.append(optax.adamw(config.learning_rate, b1=config.betas[0],
                                 b2=config.betas[1], eps=config.eps,
                                 weight_decay=config.weight_decay))
        self._tx = optax.chain(*chain)
        self._step_fn = None

    # --------------------------------------------------------------- state
    def init_state(self, params: Dict[str, Any], key: Optional[jax.Array] = None) -> TrainState:
        cfg = self.config
        if cfg.lora_rank > 0:
            if key is None:
                key = jax.random.PRNGKey(0)
            trainable = init_lora(params["unet"], cfg.lora_rank, key, cfg.lora_targets)
        else:
            # Real copy, never an alias of the caller's tree (see
            # trainer._f32_copy — donation safety).
            trainable = jax.tree.map(
                lambda x: jnp.array(x, jnp.float32, copy=True), params["unet"])
            if self.w_conditioned:
                # Teacher weights + a ZERO-init cond_proj: step 0 matches the
                # teacher for every w.
                te = dict(trainable["time_embedding"])
                te["cond_proj"] = {
                    "kernel": jnp.zeros(
                        (cfg.student_time_cond_proj_dim,
                         self.engine.unet_config.block_out_channels[0]),
                        jnp.float32,
                    )
                }
                trainable = dict(trainable)
                trainable["time_embedding"] = te
        # Target network starts as a copy of the student (EMA thereafter).
        ema = jax.tree.map(jnp.copy, trainable)
        return TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                          opt_state=self._tx.init(trainable), ema=ema)

    def _scalings(self, t):
        """Consistency boundary scalings (match schedulers/lcm.py)."""
        cfg = self.config
        scaled = t.astype(jnp.float32) * cfg.timestep_scaling
        c_skip = cfg.sigma_data**2 / (scaled**2 + cfg.sigma_data**2)
        c_out = scaled / jnp.sqrt(scaled**2 + cfg.sigma_data**2)
        return c_skip[:, None, None, None], c_out[:, None, None, None]

    # ---------------------------------------------------------------- step
    def _build_step(self):
        cfg = self.config
        unet = self.engine.unet
        student_unet = self.student_unet if self.w_conditioned else unet
        w_conditioned = self.w_conditioned
        ac_table = jnp.asarray(self.schedule.alphas_cumprod, jnp.float32)
        grid = jnp.asarray(self.grid, jnp.int32)
        k = self.k

        def alpha_sigma(t):
            # acp at t, with t == -1 (below grid) meaning the clean boundary.
            a2 = jnp.where(t >= 0, ac_table[jnp.maximum(t, 0)], 1.0)
            return jnp.sqrt(a2)[:, None, None, None], jnp.sqrt(1.0 - a2)[:, None, None, None]

        def student_params(frozen_unet, trainable):
            if cfg.lora_rank > 0:
                return apply_lora(frozen_unet, trainable, scale=cfg.lora_scale)
            return trainable

        def x0_from_eps(z, t_a, t_s, eps):
            return (z - t_s * eps) / t_a

        def distill_step(state: TrainState, teacher_unet, latents, context, uncond, key):
            """latents [B,h,w,4] clean (VAE-scaled); context/uncond [B,T,C]."""
            B = latents.shape[0]
            k_i, k_n, k_w = jax.random.split(jax.random.fold_in(key, state.step), 3)
            idx = jax.random.randint(k_i, (B,), 0, grid.shape[0])
            t = grid[idx]  # start node
            s = t - k  # previous node (t==grid[0] -> s = -1 = clean boundary)
            noise = jax.random.normal(k_n, latents.shape, jnp.float32)
            a_t, s_t = alpha_sigma(t)
            z_t = a_t * latents + s_t * noise

            # ---- frozen CFG teacher at t, one batched call over [uncond|cond]
            z2 = jnp.concatenate([z_t, z_t]).astype(unet.dtype)
            t2 = jnp.concatenate([t, t]).astype(jnp.float32)
            c2 = jnp.concatenate([uncond, context]).astype(unet.dtype)
            eps2 = unet.apply({"params": teacher_unet}, z2, t2, c2).astype(jnp.float32)
            eps_u, eps_c = jnp.split(eps2, 2)
            if w_conditioned and cfg.w_min is not None:
                # Full-LCM recipe: per-example w ~ U[w_min, w_max], embedded
                # into the student below.
                w_vec = jax.random.uniform(
                    k_w, (B,), jnp.float32, cfg.w_min, cfg.w_max
                )
            else:
                w_vec = jnp.full((B,), cfg.guidance_scale, jnp.float32)
            eps_w = eps_c + w_vec[:, None, None, None] * (eps_c - eps_u)

            # ---- one DDIM step down the grid under the guided teacher
            x0_t = x0_from_eps(z_t, a_t, s_t, eps_w)
            a_s, s_s = alpha_sigma(s)
            z_s = a_s * x0_t + s_s * eps_w

            c_skip_t, c_out_t = self._scalings(t)
            c_skip_s, c_out_s = self._scalings(jnp.maximum(s, 0))

            if w_conditioned:
                from sonicdiffusionbayeslab_tpu.models.sampler import (
                    guidance_scale_embedding,
                )

                # Diffusers LCM training convention: the sampled w is
                # embedded DIRECTLY while the teacher applies offset-form
                # guidance eps_c + w*(eps_c - eps_u).  Inference then embeds
                # guidance_scale - 1 (models/sampler.py:502-505), so a user's
                # guidance_scale=g reproduces teacher strength w = g - 1,
                # i.e. classic CFG scale g — identical semantics to
                # diffusers-trained full-LCM checkpoints.
                w_emb = guidance_scale_embedding(
                    w_vec, cfg.student_time_cond_proj_dim
                )
            else:
                w_emb = None

            def f_consistency(unet_params, z, tt, aa, ss, c_skip, c_out):
                kw = {"timestep_cond": w_emb} if w_conditioned else {}
                eps = student_unet.apply(
                    {"params": unet_params}, z.astype(unet.dtype),
                    tt.astype(jnp.float32), context.astype(unet.dtype), **kw,
                ).astype(jnp.float32)
                return c_skip * z + c_out * x0_from_eps(z, aa, ss, eps)

            # Target network (EMA student), stop-gradient by construction:
            # grads are taken only w.r.t. the online trainable tree.
            tgt_params = student_params(teacher_unet, state.ema)
            # At the clean boundary (s < 0) the consistency target is x0_t.
            f_tgt = jnp.where(
                (s < 0)[:, None, None, None],
                x0_t,
                f_consistency(tgt_params, z_s, jnp.maximum(s, 0), a_s, s_s,
                              c_skip_s, c_out_s),
            )
            f_tgt = jax.lax.stop_gradient(f_tgt)

            def loss_fn(trainable):
                on_params = student_params(teacher_unet, trainable)
                f_on = f_consistency(on_params, z_t, t, a_t, s_t, c_skip_t, c_out_t)
                d2 = (f_on - f_tgt) ** 2
                return jnp.mean(jnp.sqrt(d2 + cfg.huber_c**2) - cfg.huber_c)

            loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
            gnorm = optax.global_norm(grads)
            updates, opt_state = self._tx.update(grads, state.opt_state, state.trainable)
            trainable = optax.apply_updates(state.trainable, updates)
            d = jnp.asarray(cfg.ema_decay, jnp.float32)
            ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, state.ema, trainable)
            return (
                TrainState(step=state.step + 1, trainable=trainable,
                           opt_state=opt_state, ema=ema),
                {"loss": loss, "grad_norm": gnorm},
            )

        # State donated by default: the full-student mode carries an fp32
        # master + EMA + Adam moments (5 param-sized trees); in-place update
        # instead of double-buffering.
        if cfg.donate:
            return jax.jit(distill_step, donate_argnums=(0,))
        return jax.jit(distill_step)

    @property
    def step_fn(self):
        if self._step_fn is None:
            self._step_fn = self._build_step()
        return self._step_fn

    def distill_step(self, state: TrainState, params: Dict[str, Any], latents,
                     context, uncond_context, key):
        return self.step_fn(state, params["unet"], latents, context, uncond_context, key)

    # -------------------------------------------------------------- export
    def student_unet_params(self, state: TrainState, params: Dict[str, Any],
                            use_ema: bool = True):
        """Distilled UNet tree for sampling with the LCM plan (EMA target by
        default — the network the consistency property holds for)."""
        tree = state.ema if use_ema else state.trainable
        if self.config.lora_rank > 0:
            return apply_lora(params["unet"], tree, scale=self.config.lora_scale)
        return jax.tree.map(lambda x: x.astype(self.engine.unet.dtype), tree)
