"""Native C++ data runtime + dataset layer tests (PNG/JPEG round trips,
resize/crop parity with PIL, prefetching batcher)."""

import json
import numpy as np
import pytest
from PIL import Image

from sonicdiffusionbayeslab_tpu.data import ImageDatasetWithPrompts, PromptDataset, batched
from sonicdiffusionbayeslab_tpu.data.imageio import read_image, write_png
from sonicdiffusionbayeslab_tpu.runtime import load_dataio


@pytest.fixture(scope="module")
def lib():
    lib = load_dataio()
    if lib is None:
        pytest.skip("native dataio unavailable (g++/libpng/libjpeg missing)")
    return lib


@pytest.fixture()
def img_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    prompts = {}
    for i, (name, size) in enumerate(
        [("a.png", (40, 30)), ("b.jpg", (64, 48)), ("c.png", (31, 57))]
    ):
        arr = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / name)
        prompts[name] = f"test image {i}"
    pf = tmp_path / "prompts.json"
    pf.write_text(json.dumps(prompts))
    return d, pf


def test_native_png_roundtrip(lib, tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    write_png(p, img)
    back = read_image(p)
    np.testing.assert_array_equal((back * 255 + 0.5).astype(np.uint8), img)


def test_encode_png_bytes_in_memory(lib):
    """The serving path's in-memory encoder: valid PNG, exact round trip."""
    from io import BytesIO

    from sonicdiffusionbayeslab_tpu.data.imageio import encode_png_bytes

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (19, 23, 3), dtype=np.uint8)
    data = encode_png_bytes(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    back = np.asarray(Image.open(BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(back, img)
    # Float input path quantizes like write_png.
    dataf = encode_png_bytes(img.astype(np.float32) / 255.0)
    backf = np.asarray(Image.open(BytesIO(dataf)).convert("RGB"))
    np.testing.assert_array_equal(backf, img)


def test_native_jpeg_decode_close_to_pil(lib, tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p, quality=95)
    ours = read_image(p) * 255
    pil = np.asarray(Image.open(p).convert("RGB")).astype(np.float32)
    assert np.mean(np.abs(ours - pil)) < 2.0  # decoder rounding differences only


def test_native_resize_crop_matches_pil_shape_and_values(lib, tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
    p = tmp_path / "y.png"
    Image.fromarray(img).save(p)
    out = read_image(p, image_size=32)
    assert out.shape == (32, 32, 3)
    # PIL comparison (both bilinear short-side resize + center crop).
    pil = Image.fromarray(img)
    scale = 32 / 60
    pil = pil.resize((round(90 * scale), 32), Image.BILINEAR)
    left = (pil.width - 32) // 2
    ref = np.asarray(pil.crop((left, 0, left + 32, 32))).astype(np.float32) / 255
    assert np.mean(np.abs(out - ref)) < 0.03


def test_dataset_and_batching(img_dir):
    d, pf = img_dir
    ds = ImageDatasetWithPrompts(d, pf, image_size=16)
    assert len(ds) == 3
    item = ds[0]
    assert item["image"].shape == (16, 16, 3) and 0 <= item["image"].min()
    batches = list(batched(ds, 2))
    assert [len(b["prompt"]) for b in batches] == [2, 1]
    assert batches[0]["image"].shape == (2, 16, 16, 3)
    assert batches[0]["index"].tolist() == [0, 1]


def test_dataset_missing_images_reported(tmp_path, img_dir):
    d, pf = img_dir
    prompts = json.loads(pf.read_text())
    prompts["missing.png"] = "nope"
    pf2 = tmp_path / "p2.json"
    pf2.write_text(json.dumps(prompts))
    with pytest.raises(FileNotFoundError, match="missing"):
        ImageDatasetWithPrompts(d, pf2)
    PromptDataset(pf2)  # prompt-only dataset doesn't need the files


def test_load_prompts_normalizes_coco_lists(tmp_path):
    """Caption values normalize to strings AT LOAD TIME: the reference's
    plain {filename: "caption"} passes through, the raw COCO
    [{"caption": ...}] form is accepted (first caption wins), and anything
    else fails here with the key named — not mid-epoch in the tokenizer."""
    from sonicdiffusionbayeslab_tpu.data.dataset import load_prompts

    p = tmp_path / "ann.json"
    p.write_text(json.dumps({
        "a.png": "plain caption",
        "b.png": [{"caption": "first"}, {"caption": "second"}],
        "c.png": [{"caption": "only"}],
    }))
    got = load_prompts(p)
    assert got == {"a.png": "plain caption", "b.png": "first", "c.png": "only"}

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"a.png": 42}))
    with pytest.raises(ValueError, match="a.png"):
        load_prompts(bad)
