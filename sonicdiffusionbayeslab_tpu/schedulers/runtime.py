"""Jittable plan consumer: the scheduler half of the denoising scan body.

The reference's per-step scheduler work (``src/schedulers.py:98-187``) is
mutable-object bookkeeping + branching; here it is a fixed dataflow of a few
scalar-weighted AXPYs that XLA fuses into one elementwise kernel after the
UNet call.  Everything is fp32 regardless of model dtype (the reference
upcasts scheduler math to fp32 at schedulers.py:133 — same policy on TPU,
where the UNet runs bf16).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from sonicdiffusionbayeslab_tpu.schedulers.plan import SamplePlan


class SchedulerCarry(NamedTuple):
    latents: jax.Array  # fp32 [B, ...]
    hist: jax.Array  # fp32 [H, B, ...]
    saved: Optional[jax.Array]  # fp32 [B, ...] or None (static per plan)


def init_carry(plan: SamplePlan, latents: jax.Array) -> SchedulerCarry:
    latents = latents.astype(jnp.float32)
    if plan.init_scale != 1.0:  # sigma-space samplers (init_noise_sigma)
        latents = latents * plan.init_scale
    hist = jnp.zeros((plan.hist_depth,) + latents.shape, jnp.float32)
    saved = jnp.zeros_like(latents) if plan.has_saved else None
    return SchedulerCarry(latents, hist, saved)


def apply_row(
    carry: SchedulerCarry,
    eps: jax.Array,
    xs: Dict[str, jax.Array],
    noise: Optional[jax.Array] = None,
) -> tuple[SchedulerCarry, jax.Array]:
    """One scheduler step. ``xs`` is this step's slice of ``plan.scan_xs()``.

    Returns (new_carry, x0_prediction) — x0 is captured every step, the
    reference's introspection contract (src/models.py:257-261).
    """
    x = carry.latents
    eps = eps.astype(jnp.float32)

    m = xs["cm_sample"] * x + xs["cm_eps"] * eps
    x0 = xs["cx_sample"] * x + xs["cx_eps"] * eps

    pushed = jnp.concatenate([m[None], carry.hist[:-1]], axis=0)
    hist = jnp.where(xs["push"] > 0, pushed, carry.hist)

    new = xs["w_sample"] * x + xs["w_eps"] * eps
    new = new + jnp.einsum("h,h...->...", xs["w_hist"], hist)
    if carry.saved is not None:
        new = new + xs["w_saved"] * carry.saved
        saved = xs["s_x"] * x + xs["s_saved"] * carry.saved
        saved = saved + jnp.einsum("h,h...->...", xs["s_hist"], hist)
    else:
        saved = None
    if noise is not None:
        new = new + xs["w_noise"] * noise

    return SchedulerCarry(new, hist, saved), x0


def run_plan(
    plan: SamplePlan,
    initial_latents: jax.Array,
    eps_fn,
    rng: Optional[jax.Array] = None,
    collect_x0: bool = False,
):
    """Reference scan driver (model-free; the full sampler lives in
    ``models/sampler.py``).  ``eps_fn(timestep, latents) -> model_output``."""
    xs = {k: jnp.asarray(v) for k, v in plan.scan_xs().items()}
    needs_noise = plan.needs_noise
    if needs_noise and rng is None:
        raise ValueError(f"plan {plan.name} injects noise; pass rng")

    def body(carry_rng, step_xs):
        carry, key = carry_rng
        eps = eps_fn(step_xs["timestep"], step_xs["in_scale"] * carry.latents)
        noise = None
        if needs_noise:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, carry.latents.shape, jnp.float32)
        carry, x0 = apply_row(carry, eps, step_xs, noise)
        return (carry, key), (x0 if collect_x0 else None)

    carry0 = init_carry(plan, initial_latents)
    key0 = rng if rng is not None else jax.random.PRNGKey(0)
    (carry, _), x0s = jax.lax.scan(body, (carry0, key0), xs)
    return (carry.latents, x0s) if collect_x0 else carry.latents
