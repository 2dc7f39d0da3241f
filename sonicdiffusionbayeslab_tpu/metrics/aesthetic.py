"""LAION-style aesthetic predictor head (parity: reference
``src/metrics/aethetic_score_model.py:8-54`` — a Linear
768->1024->128->64->16->1 MLP over CLIP image embeddings with dropout,
shipped as a Lightning checkpoint but never wired into any experiment; the
rebuild provides it as a usable scorer).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class AestheticScoreMLP(nn.Module):
    input_size: int = 768

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dims_drop = ((1024, 0.2), (128, 0.2), (64, 0.1), (16, 0.0))
        for i, (dim, drop) in enumerate(dims_drop):
            x = nn.Dense(dim, name=f"fc{i}")(x)
            if drop:
                x = nn.Dropout(drop, deterministic=deterministic)(x)
        return nn.Dense(1, name="out")(x)


def normalized(a: np.ndarray, axis: int = -1, order: int = 2) -> np.ndarray:
    """L2-normalize embeddings (reference helper of the same name)."""
    a = np.asarray(a, np.float64)
    n = np.linalg.norm(a, ord=order, axis=axis, keepdims=True)
    return (a / np.clip(n, 1e-12, None)).astype(np.float32)


def load_torch_checkpoint(path: str) -> dict:
    """Convert the reference-format torch/Lightning checkpoint (sequential
    ``layers.{0,2,4,6,7}``) to this module's param tree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    idx_map = {0: "fc0", 2: "fc1", 4: "fc2", 6: "fc3", 7: "out"}
    params: dict = {}
    for i, name in idx_map.items():
        w = sd[f"layers.{i}.weight"].float().numpy()
        b = sd[f"layers.{i}.bias"].float().numpy()
        params[name] = {"kernel": w.T, "bias": b}
    return params


class AestheticScorer:
    """CLIP-embedding -> aesthetic score convenience wrapper."""

    def __init__(self, checkpoint: Optional[str] = None, input_size: int = 768):
        self.model = AestheticScoreMLP(input_size)
        if checkpoint:
            self.params = load_torch_checkpoint(checkpoint)
        else:
            self.params = self.model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, input_size))
            )["params"]
        self._fn = jax.jit(lambda p, x: self.model.apply({"params": p}, x))

    def __call__(self, embeddings: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(self.params, jnp.asarray(normalized(embeddings))))[:, 0]
