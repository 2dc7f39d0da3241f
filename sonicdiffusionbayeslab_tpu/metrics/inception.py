"""FID-Inception (InceptionV3) feature taps for FID, in Flax (NHWC).

The reference computes FID with ``feature=64`` (configs, e.g.
ddim_config.yaml:19-22) via torchmetrics' FrechetInceptionDistance, whose
extractor is pytorch-fid's FID-Inception: the torchvision InceptionV3
geometry with patched pool branches (avg pools exclude padding; Mixed_7c's
pool branch is a max pool) and taps after each block group — 64 (stem),
192 (Conv 3b/4a), 768 (Mixed_5b..6e), 2048 (Mixed_7a..7c).  All four taps
are implemented here with a name map for loading real pytorch-fid /
torchvision weights offline.  BatchNorm uses frozen statistics (eval-mode
torch).

Input contract (torchmetrics normalize=False path): uint8-range images are
given as float in [0, 1], resized to 299x299 bilinear, then scaled to
[-1, 1] (FID-Inception's transform_input convention folded in).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Pad = Union[int, Tuple[int, int]]

TAPS = (64, 192, 768, 2048)


def _pad_pairs(padding: Pad):
    if isinstance(padding, int):
        padding = (padding, padding)
    return [(padding[0], padding[0]), (padding[1], padding[1])]


class ConvBN(nn.Module):
    """Conv + frozen BatchNorm + ReLU (torch BasicConv2d in eval mode)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Pad = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=_pad_pairs(self.padding), use_bias=False, name="conv",
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


def _avgpool3s1p1(x):
    # FID-Inception pool branches: count_include_pad=False.
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad_pairs(1),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(_avgpool3s1p1(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = ConvBN(192, (1, 1), name="branch_pool")(_avgpool3s1p1(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # FID variant: Mixed_7b avg (no pad count), Mixed_7c max

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "max":
            pooled = nn.max_pool(x, (3, 3), strides=(1, 1), padding=_pad_pairs(1))
        else:
            pooled = _avgpool3s1p1(x)
        bp = ConvBN(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionBlocks(nn.Module):
    """FID-Inception through the requested deepest tap (64/192/768/2048)."""

    max_tap: int = 2048

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[int, jax.Array]:
        taps: Dict[int, jax.Array] = {}
        x = ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _maxpool3s2(x)
        taps[64] = jnp.mean(x, axis=(1, 2))  # global average pool -> [B, 64]
        if self.max_tap == 64:
            return taps
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3s2(x)
        taps[192] = jnp.mean(x, axis=(1, 2))
        if self.max_tap == 192:
            return taps
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        taps[768] = jnp.mean(x, axis=(1, 2))
        if self.max_tap == 768:
            return taps
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        taps[2048] = jnp.mean(x, axis=(1, 2))
        return taps


@dataclasses.dataclass
class InceptionFeatures:
    """Callable: [B, H, W, 3] float in [0,1] -> [B, feature] numpy."""

    feature: int = 64
    checkpoint: str | None = None

    def __post_init__(self):
        if self.feature not in TAPS:
            raise ValueError(f"InceptionFeatures supports taps {TAPS}")
        self.model = InceptionBlocks(max_tap=self.feature)
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


def _is_convbn(p: dict) -> bool:
    return set(p) >= {"conv", "bn_mean", "bn_var", "bn_scale", "bn_bias"}


def load_inception_weights(path: str, ref_params: dict) -> dict:
    """Map a pytorch-fid / torchvision InceptionV3 state dict onto the tree.

    Flax module paths join with '.' to the torch prefixes (e.g.
    ``Mixed_5b/branch5x5_1`` -> ``Mixed_5b.branch5x5_1``); only the modules
    present in ``ref_params`` (bounded by max_tap) are read.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)

    def convert(prefix: str) -> dict:
        return {
            "conv": {"kernel": np.transpose(sd[f"{prefix}.conv.weight"].float().numpy(), (2, 3, 1, 0))},
            "bn_mean": sd[f"{prefix}.bn.running_mean"].float().numpy(),
            "bn_var": sd[f"{prefix}.bn.running_var"].float().numpy(),
            "bn_scale": sd[f"{prefix}.bn.weight"].float().numpy(),
            "bn_bias": sd[f"{prefix}.bn.bias"].float().numpy(),
        }

    def walk(tree: dict, prefix: str) -> dict:
        if _is_convbn(tree):
            return convert(prefix)
        return {k: walk(v, f"{prefix}.{k}" if prefix else k) for k, v in tree.items()}

    return walk(ref_params, "")
