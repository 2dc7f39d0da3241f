"""The jitted diffusion train step.

One ``jax.jit``-compiled function per (batch shape, trainable-set) signature
does everything: timestep + noise sampling, forward-process noising, UNet
forward, prediction-target loss (epsilon / v_prediction, optional min-SNR
weighting), gradient, global-norm clip, optax update, and EMA — so a
training run is one dispatch per step, the same shape that makes the
sampler fast on this hardware.

Parallelism is the inference layout reused: params placed by
``parallel.shard_params`` (TP rules or replicated), batch sharded over the
``data`` axis, and GSPMD inserts the gradient ``psum`` — there is no
hand-written allreduce anywhere (scaling-book recipe, SURVEY §2.3).

The forward process follows the DDPM/LDM formulation on the same
float64-precomputed ``alphas_cumprod`` table the samplers use
(schedulers/schedule.py), so train/sample noise math agree to the digit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sonicdiffusionbayeslab_tpu.schedulers.schedule import NoiseSchedule, ScheduleConfig
from sonicdiffusionbayeslab_tpu.training.lora import DEFAULT_TARGETS, apply_lora, init_lora


def _f32_copy(x):
    """fp32 master copy that never aliases the source (jnp.asarray on an
    already-fp32 array is a no-op alias — with donate=True the step would
    then delete the caller's params tree out from under them)."""
    return jnp.array(x, jnp.float32, copy=True)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 1e-2
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    warmup_steps: int = 0
    max_grad_norm: float = 1.0
    prediction_type: str = "epsilon"  # epsilon | v_prediction (ddpm objective)
    snr_gamma: Optional[float] = None  # min-SNR-gamma loss weighting (None = uniform)
    # Objective: "ddpm" (epsilon/v on the alphas_cumprod forward process) or
    # "flow" — rectified-flow matching for the SD3/MMDiT family (Esser et
    # al. 2024): x_t = (1-sigma) x0 + sigma eps with sigma = sigmoid(u),
    # u ~ N(logit_mean, logit_std) (the paper's logit-normal density), the
    # model predicts the velocity eps - x0, timestep input = sigma * 1000.
    objective: str = "ddpm"  # ddpm | flow
    logit_mean: float = 0.0
    logit_std: float = 1.0
    flow_num_train_timesteps: int = 1000
    ema_decay: Optional[float] = None  # None = no EMA shadow
    # LoRA mode: rank > 0 trains adapters only (base UNet frozen).
    lora_rank: int = 0
    lora_targets: str = DEFAULT_TARGETS
    lora_scale: float = 1.0
    # What to optimize: unet (full fine-tune) | lora (implied by
    # lora_rank > 0) | controlnet (encoder copy + zero convs; UNet frozen,
    # batch must carry a control hint image).
    train_target: str = "unet"
    controlnet_scale: float = 1.0
    # Rematerialization: keep only matmul outputs across the UNet forward
    # (jax.checkpoint with dots-saveable policy) so the backward recomputes
    # the elementwise/norm intermediates.  Trades ~1 extra forward's FLOPs
    # for the activation memory that otherwise blocks full-UNet fine-tuning
    # at 512px (VERDICT r2 #7).
    remat: bool = False
    # Optimizer: "adamw" (reference-standard), "adamw8bit" (Adam semantics
    # with blockwise-int8 moments — ~1/4 the state HBM, training/opt8bit.py),
    # or "adafactor" (factored second moments, no first moment — the
    # smallest-state option; changes update semantics).  Measured receipts
    # for the full-UNet 512px fit question: docs/TRAINING.md.
    optimizer: str = "adamw"
    # Donate the TrainState into the jitted step so XLA updates
    # trainable/opt_state/ema in place instead of double-buffering them
    # (~10 GB at SD-1.5 full-UNet scale).  The old state is invalid after
    # train_step on TPU/GPU — always reassign `state = train_step(state,..)`
    # (the documented contract).  No-op on CPU.
    donate: bool = True


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array  # scalar int32
    trainable: Any  # UNet param tree, or LoRA adapter tree in LoRA mode
    opt_state: Any
    ema: Any  # shadow of `trainable` or None


class DiffusionTrainer:
    """Builds and caches the jitted train step for an engine's UNet."""

    def __init__(
        self,
        engine,
        config: TrainConfig = TrainConfig(),
        schedule_config: ScheduleConfig = None,
    ):
        self.engine = engine
        self.config = config
        self.schedule = NoiseSchedule.create(schedule_config or ScheduleConfig())
        if config.prediction_type not in ("epsilon", "v_prediction"):
            raise ValueError(f"unknown prediction_type {config.prediction_type!r}")
        if config.objective not in ("ddpm", "flow"):
            raise ValueError(f"unknown objective {config.objective!r} (ddpm|flow)")
        if config.train_target not in ("unet", "lora", "controlnet"):
            raise ValueError(f"unknown train_target {config.train_target!r}")
        if config.objective == "flow":
            if config.train_target == "controlnet":
                raise ValueError("flow objective has no ControlNet family (MMDiT)")
            if config.snr_gamma is not None:
                raise ValueError(
                    "snr_gamma is a DDPM-SNR concept; the flow objective's "
                    "timestep density is the logit_mean/logit_std weighting")
        self.target = (
            "lora" if (config.lora_rank > 0 and config.train_target == "unet")
            else config.train_target
        )
        if self.target == "lora" and config.lora_rank <= 0:
            raise ValueError("train_target='lora' requires lora_rank > 0")
        self._tx = self._make_optimizer()
        self._step_fn = None

    # ----------------------------------------------------------- optimizer
    def _make_optimizer(self) -> optax.GradientTransformation:
        cfg = self.config
        if cfg.warmup_steps > 0:
            lr = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
        else:
            lr = cfg.learning_rate
        chain = []
        if cfg.max_grad_norm and cfg.max_grad_norm > 0:
            chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
        if cfg.optimizer == "adafactor":
            # Factored stats, momentum off: optimizer state is O(rows+cols)
            # per kernel instead of 2 full fp32 trees.
            chain.append(
                optax.adafactor(
                    learning_rate=lr, weight_decay_rate=cfg.weight_decay or None,
                )
            )
        elif cfg.optimizer == "adamw8bit":
            # Adam semantics with blockwise-int8 moments (training/
            # opt8bit.py) — ~1/4 the optimizer-state HBM, the single-chip
            # answer when fp32 AdamW state doesn't fit but Adafactor's
            # momentum-free update is unwanted.
            from sonicdiffusionbayeslab_tpu.training.opt8bit import adamw8bit

            chain.append(
                adamw8bit(
                    lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                    weight_decay=cfg.weight_decay,
                )
            )
        elif cfg.optimizer == "adamw":
            chain.append(
                optax.adamw(
                    lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                    weight_decay=cfg.weight_decay,
                )
            )
        else:
            raise ValueError(
                f"unknown optimizer {cfg.optimizer!r} (adamw|adamw8bit|adafactor)")
        return chain[0] if len(chain) == 1 else optax.chain(*chain)

    # ----------------------------------------------------------- state
    def init_state(
        self,
        params: Dict[str, Any],
        key: Optional[jax.Array] = None,
        controlnet_params: Optional[dict] = None,
    ) -> TrainState:
        """LoRA mode: trainable = fresh adapters over the frozen UNet.
        ControlNet mode: trainable = the encoder-copy tree (pass
        ``controlnet_params`` to resume/warm-start; default = fresh init
        whose zero convs make step 0 a no-op).  Full mode: trainable = the
        UNet tree itself (a float32 master copy — bf16 Adam moments are a
        known-divergence footgun)."""
        cfg = self.config
        if self.target == "lora":
            if key is None:
                key = jax.random.PRNGKey(0)
            trainable = init_lora(params["unet"], cfg.lora_rank, key, cfg.lora_targets)
        elif self.target == "controlnet":
            src = controlnet_params or self.engine.init_controlnet_params(seed=0)
            trainable = jax.tree.map(_f32_copy, src)
        else:
            trainable = jax.tree.map(_f32_copy, params["unet"])
        ema = jax.tree.map(jnp.copy, trainable) if cfg.ema_decay else None
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            trainable=trainable,
            opt_state=self._tx.init(trainable),
            ema=ema,
        )

    # ----------------------------------------------------------- step
    def _build_step(self):
        cfg = self.config
        target = self.target
        unet = self.engine.unet
        controlnet = self.engine.controlnet
        T = len(self.schedule.alphas_cumprod)
        ac = jnp.asarray(self.schedule.alphas_cumprod, jnp.float32)  # [T]
        snr_table = ac / (1.0 - ac)  # signal-to-noise per timestep

        def effective_unet_params(frozen_unet, trainable):
            if target == "lora":
                return apply_lora(frozen_unet, trainable, scale=cfg.lora_scale)
            return trainable

        def train_step(state: TrainState, frozen_unet, latents, context, key, hint=None,
                       added=None):
            """latents [B,h,w,C] (VAE-scaled), context [B,T,C], key PRNG;
            hint [B,8h,8w,3] control image (controlnet target only); added =
            added_cond dict for families that need it (MMDiT pooled
            text_embeds, SDXL text_time micro-conditioning)."""
            B = latents.shape[0]
            k_t, k_noise = jax.random.split(jax.random.fold_in(key, state.step))
            noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
            if cfg.objective == "flow":
                u = cfg.logit_mean + cfg.logit_std * jax.random.normal(
                    k_t, (B,), jnp.float32)
                sigma = jax.nn.sigmoid(u)
                s = sigma[:, None, None, None]
                noisy = (1.0 - s) * latents + s * noise
                y = noise - latents  # velocity target
                t = sigma * cfg.flow_num_train_timesteps
                w = jnp.ones((B,), jnp.float32)
            else:
                t = jax.random.randint(k_t, (B,), 0, T)
                a = ac[t][:, None, None, None]
                sqrt_a, sqrt_1ma = jnp.sqrt(a), jnp.sqrt(1.0 - a)
                noisy = sqrt_a * latents + sqrt_1ma * noise
                if cfg.prediction_type == "v_prediction":
                    y = sqrt_a * noise - sqrt_1ma * latents
                else:
                    y = noise

                if cfg.snr_gamma is not None:
                    snr = snr_table[t]
                    w = jnp.minimum(snr, cfg.snr_gamma)
                    # min-SNR-gamma (Hang et al. 2023): epsilon loss divides
                    # by SNR; v loss by SNR+1.
                    w = (w / (snr + 1.0) if cfg.prediction_type == "v_prediction"
                         else w / snr)
                else:
                    w = jnp.ones((B,), jnp.float32)

            maybe_remat = (
                functools.partial(
                    jax.checkpoint,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )
                if cfg.remat
                else (lambda f: f)
            )

            def loss_fn(trainable):
                x_in = noisy.astype(unet.dtype)
                t_in = t.astype(jnp.float32)
                c_in = context.astype(unet.dtype)
                if target == "controlnet":

                    @maybe_remat
                    def fwd(tr, fz, x, tt, c, h):
                        residuals = controlnet.apply(
                            {"params": tr}, x, tt, c, h, cfg.controlnet_scale
                        )
                        return unet.apply(
                            {"params": fz}, x, tt, c, control_residuals=residuals
                        ).astype(jnp.float32)

                    pred = fwd(trainable, frozen_unet, x_in, t_in, c_in, hint)
                else:
                    p = effective_unet_params(frozen_unet, trainable)

                    @maybe_remat
                    def fwd(pp, x, tt, c, add):
                        if add is None:
                            return unet.apply(
                                {"params": pp}, x, tt, c).astype(jnp.float32)
                        return unet.apply(
                            {"params": pp}, x, tt, c, add).astype(jnp.float32)

                    pred = fwd(p, x_in, t_in, c_in, added)
                per = jnp.mean((pred - y) ** 2, axis=(1, 2, 3))
                return jnp.mean(w * per)

            loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
            gnorm = optax.global_norm(grads)
            updates, opt_state = self._tx.update(grads, state.opt_state, state.trainable)
            trainable = optax.apply_updates(state.trainable, updates)
            ema = state.ema
            if cfg.ema_decay:
                d = jnp.asarray(cfg.ema_decay, jnp.float32)
                ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema, trainable)
            new_state = TrainState(
                step=state.step + 1, trainable=trainable, opt_state=opt_state, ema=ema
            )
            return new_state, {"loss": loss, "grad_norm": gnorm}

        if cfg.donate:
            # In-place state update: old trainable/opt_state/ema buffers are
            # reused for the new state (TrainState is arg 0).
            return jax.jit(train_step, donate_argnums=(0,))
        return jax.jit(train_step)

    @property
    def step_fn(self):
        if self._step_fn is None:
            self._step_fn = self._build_step()
        return self._step_fn

    def train_step(self, state: TrainState, params: Dict[str, Any], latents, context, key,
                   hint=None, added=None):
        """One optimization step. ``params['unet']`` is the frozen base in
        LoRA/ControlNet modes (unused in full mode — the trainable tree IS
        the UNet); ``hint`` is the control image batch (controlnet target);
        ``added`` is the added_cond dict (MMDiT/SDXL families)."""
        frozen = params["unet"] if self.target in ("lora", "controlnet") else None
        if self.target == "controlnet" and hint is None:
            raise ValueError("controlnet training needs a hint image batch")
        return self.step_fn(state, frozen, latents, context, key, hint, added)

    # ----------------------------------------------------------- export
    def unet_params(self, state: TrainState, params: Dict[str, Any], use_ema: bool = False):
        """Effective UNet tree for sampling (EMA shadow if kept)."""
        tree = state.ema if (use_ema and state.ema is not None) else state.trainable
        if self.target == "lora":
            return apply_lora(params["unet"], tree, scale=self.config.lora_scale)
        if self.target == "controlnet":
            return params["unet"]  # frozen; the trained tree is the ControlNet
        return jax.tree.map(lambda x: x.astype(self.engine.unet.dtype), tree)

    def controlnet_params(self, state: TrainState, use_ema: bool = False):
        """Trained ControlNet tree for engine.sample(control=...)."""
        if self.target != "controlnet":
            raise ValueError("trainer target is not 'controlnet'")
        tree = state.ema if (use_ema and state.ema is not None) else state.trainable
        return jax.tree.map(lambda x: x.astype(self.engine.unet.dtype), tree)
