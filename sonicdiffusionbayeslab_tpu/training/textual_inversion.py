"""Textual inversion (Gal et al. 2022): learn new concept token embeddings.

Third training target alongside full fine-tune / LoRA / ControlNet: the
ONLY trainable parameters are k rows of the CLIP text tower's token
embedding matrix (the placeholder tokens); UNet, VAE and the rest of the
text encoder stay frozen.  Functional formulation (TPU-friendly, same shape
as training/lora.py): the jitted step scatters the trainable rows into the
frozen embedding table with ``.at[ids].set`` — autodiff routes gradients to
exactly those rows, no masking or stop-gradient bookkeeping.

The text encoder forward runs INSIDE the train step here (unlike the other
targets, which consume precomputed context) because the gradient must flow
through it into the embedding rows.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sonicdiffusionbayeslab_tpu.schedulers.schedule import NoiseSchedule, ScheduleConfig
from sonicdiffusionbayeslab_tpu.training.trainer import TrainConfig, TrainState


class TextualInversionTrainer:
    """Optimizes embedding rows ``placeholder_ids`` of the text tower."""

    def __init__(
        self,
        engine,
        placeholder_ids: Sequence[int],
        config: TrainConfig = TrainConfig(),
        schedule_config: ScheduleConfig = None,
    ):
        self.engine = engine
        self.config = config
        # Order-preserving dedupe: init_ids pair with placeholder_ids BY
        # POSITION, so sorting here would silently permute concept seeds.
        self.placeholder_ids = np.asarray(
            list(dict.fromkeys(int(i) for i in placeholder_ids))
        )
        if len(self.placeholder_ids) == 0:
            raise ValueError("need at least one placeholder token id")
        if self.placeholder_ids.max() >= engine.text_config.vocab_size:
            raise ValueError("placeholder id out of vocab range")
        self.schedule = NoiseSchedule.create(schedule_config or ScheduleConfig())
        if config.prediction_type not in ("epsilon", "v_prediction"):
            raise ValueError(f"unknown prediction_type {config.prediction_type!r}")
        cfg = config
        lr = (
            optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
            if cfg.warmup_steps > 0 else cfg.learning_rate
        )
        chain = []
        if cfg.max_grad_norm and cfg.max_grad_norm > 0:
            chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
        # Plain adam: weight decay would drag the concept embedding to zero.
        chain.append(optax.adam(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps))
        self._tx = optax.chain(*chain)
        self._step_fn = None

    # ------------------------------------------------------------- state
    def init_state(
        self, params: Dict[str, Any], init_ids: Optional[Sequence[int]] = None
    ) -> TrainState:
        """``init_ids``: existing tokens whose embeddings seed the new
        concepts (the paper's coarse-class init, e.g. "sculpture"); default
        = the placeholder rows themselves."""
        table = params["text"]["token_embedding"]["embedding"]
        src = np.asarray(init_ids) if init_ids is not None else self.placeholder_ids
        if len(src) != len(self.placeholder_ids):
            raise ValueError("init_ids length != placeholder count")
        trainable = jnp.asarray(table[jnp.asarray(src)], jnp.float32)
        ema = jnp.copy(trainable) if self.config.ema_decay else None
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            trainable=trainable,
            opt_state=self._tx.init(trainable),
            ema=ema,
        )

    # ------------------------------------------------------------- step
    def _build_step(self):
        cfg = self.config
        engine = self.engine
        unet, text = engine.unet, engine.text
        ids_const = jnp.asarray(self.placeholder_ids, jnp.int32)
        T = len(self.schedule.alphas_cumprod)
        ac = jnp.asarray(self.schedule.alphas_cumprod, jnp.float32)
        snr_table = ac / (1.0 - ac)

        def train_step(state: TrainState, text_params, unet_params, latents, input_ids, key):
            B = latents.shape[0]
            k_t, k_noise = jax.random.split(jax.random.fold_in(key, state.step))
            t = jax.random.randint(k_t, (B,), 0, T)
            noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
            a = ac[t][:, None, None, None]
            sqrt_a, sqrt_1ma = jnp.sqrt(a), jnp.sqrt(1.0 - a)
            noisy = sqrt_a * latents + sqrt_1ma * noise
            y = (
                sqrt_a * noise - sqrt_1ma * latents
                if cfg.prediction_type == "v_prediction" else noise
            )
            if cfg.snr_gamma is not None:
                snr = snr_table[t]
                w = jnp.minimum(snr, cfg.snr_gamma)
                w = w / (snr + 1.0) if cfg.prediction_type == "v_prediction" else w / snr
            else:
                w = jnp.ones((B,), jnp.float32)

            def loss_fn(rows):
                table = text_params["token_embedding"]["embedding"]
                patched = dict(text_params)
                patched["token_embedding"] = {
                    "embedding": table.at[ids_const].set(rows.astype(table.dtype))
                }
                ctx = text.apply({"params": patched}, input_ids)["last_hidden_state"]
                pred = unet.apply(
                    {"params": unet_params}, noisy.astype(unet.dtype),
                    t.astype(jnp.float32), ctx.astype(unet.dtype),
                ).astype(jnp.float32)
                per = jnp.mean((pred - y) ** 2, axis=(1, 2, 3))
                return jnp.mean(w * per)

            loss, grads = jax.value_and_grad(loss_fn)(state.trainable)
            gnorm = optax.global_norm(grads)
            updates, opt_state = self._tx.update(grads, state.opt_state, state.trainable)
            trainable = optax.apply_updates(state.trainable, updates)
            ema = state.ema
            if cfg.ema_decay:
                d = jnp.asarray(cfg.ema_decay, jnp.float32)
                ema = d * ema + (1 - d) * trainable
            return (
                TrainState(step=state.step + 1, trainable=trainable,
                           opt_state=opt_state, ema=ema),
                {"loss": loss, "grad_norm": gnorm},
            )

        return jax.jit(train_step)

    @property
    def step_fn(self):
        if self._step_fn is None:
            self._step_fn = self._build_step()
        return self._step_fn

    def train_step(self, state: TrainState, params: Dict[str, Any], latents, input_ids, key):
        """``input_ids`` [B, T] must contain the placeholder ids in the
        prompts (e.g. tokenizer output for 'a photo of <concept>')."""
        return self.step_fn(
            state, params["text"], params["unet"], latents,
            jnp.asarray(input_ids, jnp.int32), key,
        )

    # ------------------------------------------------------------- export
    def text_params(self, state: TrainState, params: Dict[str, Any], use_ema: bool = False):
        """Frozen text tree with the learned rows scattered in — drop-in for
        engine.encode_prompts."""
        rows = state.ema if (use_ema and state.ema is not None) else state.trainable
        table = params["text"]["token_embedding"]["embedding"]
        out = dict(params["text"])
        out["token_embedding"] = {
            "embedding": table.at[jnp.asarray(self.placeholder_ids)].set(
                rows.astype(table.dtype)
            )
        }
        return out

    def save_embeddings(self, state: TrainState, path) -> None:
        """Portable artifact: {token_id: vector} npz."""
        np.savez(
            path,
            ids=self.placeholder_ids,
            embeddings=np.asarray(state.trainable, np.float32),
        )
