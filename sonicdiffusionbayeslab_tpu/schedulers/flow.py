"""Flow-matching (rectified-flow) Euler sampling as plan rows.

Beyond-reference model-family support: SD3-class rectified-flow
transformers (models/mmdit.py) are trained on the linear interpolation
path

    x_t = (1 - sigma_t) x0 + sigma_t eps,      sigma in (0, 1]

with the model predicting the *velocity* v = eps - x0 (the time derivative
of x_t along the path).  Sampling is the ODE solved with explicit Euler:

    x'  = x + (sigma_next - sigma) * v
    x0  = x - sigma * v                        (introspection / x0 capture)

Both are linear in (x, v), so each step is one :class:`StepRow` — the same
fused-AXPY dataflow as every VP/sigma-space sampler in this framework, and
flow models compose with the whole engine (CFG, x0 capture, microbatching,
mesh sharding) for free.

Sigma grid (diffusers FlowMatchEulerDiscreteScheduler semantics, the SD3
reference implementation): uniform in sigma from 1.0 down to 1/T, passed
through the resolution "shift" (Esser et al. 2024, §5.3.2 — higher shift
spends more steps at high noise, which large-resolution latents need):

    sigma_shifted = shift * sigma / (1 + (shift - 1) * sigma)

The model's conditioning timestep is ``sigma_shifted * T``; the initial
latents are pure N(0,1) noise (sigma_max shifts to exactly 1.0, so
``init_scale = 1``).
"""

from __future__ import annotations

from typing import List

import numpy as np

from sonicdiffusionbayeslab_tpu.schedulers.plan import StepRow


def flow_sigmas(
    num_steps: int,
    *,
    shift: float = 3.0,
    num_train_timesteps: int = 1000,
) -> np.ndarray:
    """[num_steps + 1] shifted sigma grid, descending, trailing 0.0."""
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    T = num_train_timesteps
    sig = np.linspace(1.0, 1.0 / T, num_steps, dtype=np.float64)
    sig = shift * sig / (1.0 + (shift - 1.0) * sig)
    return np.concatenate([sig, [0.0]])


def flow_transition_row(
    sigma: float,
    sigma_next: float,
    *,
    num_train_timesteps: int = 1000,
    tag: str = "",
) -> StepRow:
    """One explicit-Euler transition sigma -> sigma_next on the flow path.

    Memoryless and linear in (x, v) — the flow analogue of
    :func:`..ddim.ddim_transition_row`, and the unit every flow plan
    composer (two-scheduler / interleave / skip) is built from."""
    s, s_next = float(sigma), float(sigma_next)
    return StepRow(
        timestep=s * num_train_timesteps,
        in_scale=1.0,  # flow models take the raw sample
        w_sample=1.0,
        w_eps=s_next - s,  # x' = x + (sigma' - sigma) v
        cm_sample=1.0,
        cm_eps=s_next - s,  # history entry (unused: hist depth 1, no refs)
        cx_sample=1.0,
        cx_eps=-s,  # x0 = x - sigma v
        push=True,
        scheduler="flow_euler",
        tag=tag,
    )


def flow_euler_rows(
    sigmas: np.ndarray,
    *,
    num_train_timesteps: int = 1000,
    tag: str = "",
) -> List[StepRow]:
    """One Euler row per sigma transition; model output = velocity."""
    sig = np.asarray(sigmas, np.float64)
    return [
        flow_transition_row(
            float(sig[i]), float(sig[i + 1]),
            num_train_timesteps=num_train_timesteps, tag=tag,
        )
        for i in range(len(sig) - 1)
    ]
