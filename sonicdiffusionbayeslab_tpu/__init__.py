"""SonicDiffusionBayesLab-TPU: a TPU-native diffusion sampling & benchmarking framework.

A ground-up JAX/Flax/pjit/Pallas re-design of the capabilities of
``Kotstantinovskiy/SonicDiffusionBayesLab`` (a single-GPU torch/diffusers
experiment harness for fast Stable-Diffusion sampling — see that repo's
``src/`` for the reference feature surface).

Design stance (TPU-first, not a port):

* Schedulers are **pure functions**: every sampler run is described by a
  :class:`~sonicdiffusionbayeslab_tpu.schedulers.plans.SamplePlan` — per-step
  coefficient arrays computed in float64 numpy at trace time — consumed by a
  single ``jax.lax.scan`` denoising loop.  Scheduler switching, interleaving
  and step skipping are *plan composition*, never traced Python branches.
* The model stack (CLIP text encoder, UNet2DCondition, VAE) is Flax, compiled
  once per (shape, plan-length) by ``jax.jit``; hot ops have Pallas TPU
  kernels (flash attention, fused GroupNorm+SiLU).
* Scaling is a ``jax.sharding.Mesh`` (data ×, optionally tensor) with
  ``NamedSharding`` — no hand-rolled transport.
* The YAML config / registry experiment surface of the reference is kept, so
  the same experiment specs drive TPU runs.
"""

__version__ = "0.1.0"

from sonicdiffusionbayeslab_tpu.registry import (  # noqa: F401
    methods_registry,
    metrics_registry,
    models_registry,
    schedulers_registry,
)
