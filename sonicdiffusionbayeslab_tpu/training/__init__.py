"""Training subsystem (beyond-reference capability).

The reference is inference-only (SURVEY §5 checkpoint/resume: weights are
pulled from the HF hub, nothing is ever trained). A production diffusion
framework needs the other half: this package provides the TPU-native
training loop — a single jitted ``train_step`` (noise sampling + UNet
forward + diffusion loss + optax update + EMA, all under one ``jax.jit``)
that runs data-parallel / tensor-parallel over a ``jax.sharding.Mesh`` with
GSPMD-inserted gradient reductions, plus functional LoRA adapters for
parameter-efficient fine-tuning.
"""

from sonicdiffusionbayeslab_tpu.training.lora import (
    apply_lora,
    init_lora,
    lora_to_peft_state_dict,
)
from sonicdiffusionbayeslab_tpu.training.distillation import LCMDistillConfig, LCMDistiller
from sonicdiffusionbayeslab_tpu.training.textual_inversion import TextualInversionTrainer
from sonicdiffusionbayeslab_tpu.training.trainer import (
    DiffusionTrainer,
    TrainConfig,
    TrainState,
)

__all__ = [
    "DiffusionTrainer",
    "LCMDistillConfig",
    "LCMDistiller",
    "TextualInversionTrainer",
    "TrainConfig",
    "TrainState",
    "init_lora",
    "apply_lora",
    "lora_to_peft_state_dict",
]
