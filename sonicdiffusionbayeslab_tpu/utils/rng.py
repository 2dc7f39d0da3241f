"""Deterministic RNG utilities (TPU-native replacement for the reference's
``torch.Generator(device).manual_seed`` at ``src/experiments/base_experiment.py:51-53``).

JAX keys are pure values: one experiment seed fans out into independent,
reproducible streams per (grid point, batch, device) via ``fold_in`` —
no mutable generator object, and identical results regardless of device
count or batching (each sample's noise depends only on its global index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def experiment_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def grid_key(key: jax.Array, grid_index: int) -> jax.Array:
    """Stream for one sweep grid point."""
    return jax.random.fold_in(key, np.uint32(grid_index))


def batch_key(key: jax.Array, batch_index: int) -> jax.Array:
    return jax.random.fold_in(key, np.uint32(batch_index))


def per_sample_latents(key: jax.Array, sample_indices: jax.Array, shape, dtype=jnp.float32):
    """Initial latents where sample ``i``'s noise depends only on ``i``.

    ``sample_indices``: int32 [B] global dataset indices. Returns [B, *shape].
    Batch-size invariant by construction (reference behavior depends on batch
    layout of torch.Generator; we fix that — documented divergence).
    """

    def one(idx):
        return jax.random.normal(jax.random.fold_in(key, idx), shape, dtype)

    return jax.vmap(one)(sample_indices)


def setup_seed(seed: int) -> jax.Array:
    """Parity shim for reference ``model_utils.setup_seed`` (model_utils.py:15-17)."""
    np.random.seed(seed)
    return experiment_key(seed)
