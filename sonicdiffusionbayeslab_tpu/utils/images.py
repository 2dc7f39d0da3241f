"""Image conversion / saving / grid helpers.

Parity surface: reference ``src/utils/model_utils.py`` (``to_pil_image``,
``save_image``, ``save_table``) and ``base_experiment.collate_grid`` /
``make_grid`` x0-grid collation (base_experiment.py:276-284) — re-expressed
over numpy/JAX arrays instead of torch tensors.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[..., H, W, C] float in [0, 1] -> uint8."""
    images = np.asarray(images, dtype=np.float32)
    return np.clip(images * 255.0 + 0.5, 0, 255).astype(np.uint8)


def to_pil_image(image) -> "PIL.Image.Image":  # noqa: F821
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.moveaxis(arr, 0, -1)  # CHW -> HWC
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    return Image.fromarray(arr)


def save_image(image, path: str | os.PathLike) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    to_pil_image(image).save(path)


def save_table(rows: dict[str, Sequence], path: str | os.PathLike, name: str) -> Path:
    """Write a metric table as TSV (reference model_utils.py:31-39)."""
    import pandas as pd

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    out = path / f"{name}.tsv"
    pd.DataFrame(rows).to_csv(out, sep="\t", index=False)
    return out


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2, pad_value: float = 0.0) -> np.ndarray:
    """Tile [N, H, W, C] into one [GH, GW, C] grid image (torchvision-free)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = -(-n // ncol)
    grid = np.full(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        pad_value,
        dtype=images.dtype,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y : y + h, x : x + w] = images[i]
    return grid


def collate_x0_grid(x0_preds: Iterable[np.ndarray], nrow: int = 8) -> np.ndarray:
    """Stack per-step x0 decodes ([S, H, W, C] or list) into a grid image."""
    frames = np.stack([np.asarray(f) for f in x0_preds])
    return make_grid(frames, nrow=nrow)
