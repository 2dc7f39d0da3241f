"""InceptionV3 feature taps for FID, in Flax (NHWC).

The reference computes FID with ``feature=64`` (configs, e.g.
ddim_config.yaml:19-22), i.e. the globally-pooled output of FID-Inception's
*first block* (Conv 1a/2a/2b + maxpool -> 64 channels); ``feature=192`` is
the second block (Conv 3b/4a + maxpool).  Those blocks are implemented here
exactly (BN with frozen statistics, as in eval-mode torch), with a name map
for loading real pytorch-fid/torchvision weights offline; the deeper 768-
and 2048-d taps remain on the CLIP-feature fallback (metrics/metrics.py)
until the full Mixed blocks land.

Input contract (torchmetrics normalize=False path): uint8-range images are
given as float in [0, 1], resized to 299x299 bilinear, then scaled to
[-1, 1] (FID-Inception's transform_input convention folded in).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv + frozen BatchNorm + ReLU (torch BasicConv2d in eval mode)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        # Frozen BN: y = (x - mean) / sqrt(var + eps) * gamma + beta
        c = self.features
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        gamma = self.param("bn_scale", nn.initializers.ones, (c,))
        beta = self.param("bn_bias", nn.initializers.zeros, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
        return nn.relu(x)


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionBlocks(nn.Module):
    """FID-Inception stem through the 64-d and 192-d taps."""

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[int, jax.Array]:
        taps: Dict[int, jax.Array] = {}
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _maxpool3s2(x)
        taps[64] = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 64]
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3s2(x)
        taps[192] = jnp.mean(x, axis=(1, 2))
        return taps


@dataclasses.dataclass
class InceptionFeatures:
    """Callable: [B, H, W, 3] float in [0,1] -> [B, feature] numpy."""

    feature: int = 64
    checkpoint: str | None = None

    def __post_init__(self):
        if self.feature not in (64, 192):
            raise ValueError("InceptionFeatures supports taps 64 and 192")
        self.model = InceptionBlocks()
        x0 = jnp.zeros((1, 299, 299, 3))
        self.params = self.model.init(jax.random.PRNGKey(0), x0)["params"]
        if self.checkpoint:
            self.params = load_inception_weights(self.checkpoint, self.params)
        feat = self.feature

        @jax.jit
        def fn(p, images):
            x = jax.image.resize(images, (images.shape[0], 299, 299, 3), "bilinear")
            x = x * 2.0 - 1.0
            return self.model.apply({"params": p}, x)[feat]

        self._fn = fn

    def __call__(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(self.params, jnp.asarray(images, jnp.float32)))


_STEM = ("Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1", "Conv2d_4a_3x3")


def load_inception_weights(path: str, ref_params: dict) -> dict:
    """Map a torchvision/pytorch-fid InceptionV3 state dict onto the stem."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {k: dict(v) for k, v in ref_params.items()}
    for name in _STEM:
        out[name] = {
            "conv": {"kernel": np.transpose(sd[f"{name}.conv.weight"].float().numpy(), (2, 3, 1, 0))},
            "bn_mean": sd[f"{name}.bn.running_mean"].float().numpy(),
            "bn_var": sd[f"{name}.bn.running_var"].float().numpy(),
            "bn_scale": sd[f"{name}.bn.weight"].float().numpy(),
            "bn_bias": sd[f"{name}.bn.bias"].float().numpy(),
        }
    return out
