"""Datasets: folder-of-images + filename->caption JSON (COCO-style).

Parity surface: reference ``src/dataset/dataset.py:8-41``
(``ImageDatasetWithPrompts`` yielding {image_file, image, prompt}) and the
Resize/CenterCrop transform built in ``base_experiment.py:79-85`` — re-done
without torch: decoding/resizing goes through the native C++ loader
(``runtime/dataio``) when built, PIL otherwise, and batches are numpy NHWC
float32 in [0, 1] ready for device upload.

The prompt JSON format is the reference's: {"<filename>": "<caption>", ...}
(e.g. data/dataset/img2annotations_test.json, 1000 entries).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np


def load_prompts(prompts_file: str | Path) -> Dict[str, str]:
    with open(prompts_file) as f:
        data = json.load(f)
    if not isinstance(data, dict):
        raise ValueError(f"{prompts_file}: expected filename->caption mapping")
    # Normalize values to plain caption strings AT LOAD TIME — a wrong type
    # must fail here with the file and key named, not 40 frames deep in the
    # tokenizer mid-epoch.  The reference format is {filename: "caption"};
    # the raw COCO annotation form {filename: [{"caption": ...}, ...]} is
    # common enough in the wild to accept (first caption wins).
    out: Dict[str, str] = {}
    for fname, v in data.items():
        if isinstance(v, list) and v:
            v = v[0]
        if isinstance(v, dict):
            v = v.get("caption")
        if not isinstance(v, str):
            raise ValueError(
                f"{prompts_file}: caption for {fname!r} must be a string "
                f"(or COCO [{{'caption': ...}}] list), got {type(v).__name__}")
        out[fname] = v
    return out


class PromptDataset:
    """Captions only — what generation needs (images are outputs).

    ``max_count`` keeps the first N files (sorted order, deterministic) —
    the ``dataset.max_count`` config knob for receipt/subset runs of a
    full grid without editing the shipped YAML.
    """

    def __init__(self, prompts_file: str | Path, max_count: Optional[int] = None):
        self.img2prompt = load_prompts(prompts_file)
        self.files: List[str] = sorted(self.img2prompt)
        if max_count is not None:
            self.files = self.files[: int(max_count)]

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, i: int) -> dict:
        f = self.files[i]
        return {"image_file": f, "prompt": self.img2prompt[f], "index": i}


class ImageDatasetWithPrompts(PromptDataset):
    """Images + captions — what validation (CLIP/FID/ImageReward) needs.

    ``image_size``: images are resized (short side) then center-cropped to
    (image_size, image_size), matching the reference transform
    (base_experiment.py:79-85); None keeps original size (the standalone
    CLIP-score CLI path, calc_clip_score.py:68-86).
    """

    def __init__(
        self,
        image_dir: str | Path,
        prompts_file: str | Path,
        image_size: Optional[int] = None,
        max_count: Optional[int] = None,
    ):
        super().__init__(prompts_file, max_count)
        self.image_dir = Path(image_dir)
        self.image_size = image_size
        missing = [f for f in self.files if not (self.image_dir / f).exists()]
        if missing:
            raise FileNotFoundError(
                f"{len(missing)} of {len(self.files)} dataset images missing under "
                f"{self.image_dir}, e.g. {missing[:3]}"
            )

    def load_image(self, filename: str) -> np.ndarray:
        from sonicdiffusionbayeslab_tpu.data.imageio import read_image

        return read_image(self.image_dir / filename, self.image_size)

    def __getitem__(self, i: int) -> dict:
        item = super().__getitem__(i)
        item["image"] = self.load_image(item["image_file"])
        return item


def batched(
    dataset,
    batch_size: int,
    *,
    drop_remainder: bool = False,
    prefetch: int = 2,
    num_threads: int = 4,
) -> Iterator[dict]:
    """Batch iterator with background prefetch.

    Stacks dict-of-arrays batches; image loading runs in a thread pool so
    host IO overlaps device compute (the reference used a synchronous torch
    DataLoader with num_workers=0 — SURVEY §5 'race detection' note).
    """
    import concurrent.futures as cf

    n = len(dataset)
    starts = list(range(0, n, batch_size))
    if drop_remainder and n % batch_size:
        starts = starts[:-1]

    def load(s):
        items = [dataset[i] for i in range(s, min(s + batch_size, n))]
        batch: dict = {}
        for k in items[0]:
            vals = [it[k] for it in items]
            if isinstance(vals[0], np.ndarray):
                batch[k] = np.stack(vals)
            elif isinstance(vals[0], (int, np.integer)):
                batch[k] = np.asarray(vals)
            else:
                batch[k] = vals
        return batch

    with cf.ThreadPoolExecutor(max_workers=num_threads) as pool:
        pending = [pool.submit(load, s) for s in starts[:prefetch]]
        next_submit = prefetch
        for _ in starts:
            fut = pending.pop(0)
            if next_submit < len(starts):
                pending.append(pool.submit(load, starts[next_submit]))
                next_submit += 1
            yield fut.result()
