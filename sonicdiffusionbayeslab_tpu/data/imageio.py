"""Image read/write: native C++ codecs with PIL fallback.

``read_image`` returns HWC float32 RGB in [0, 1], optionally resized (short
side) + center-cropped — the reference dataset transform
(base_experiment.py:79-85) done on the host in native code.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

from sonicdiffusionbayeslab_tpu.runtime import load_dataio


def _native_decode(lib, raw: bytes) -> Optional[np.ndarray]:
    # Generous capacity: assume <= 64 MPixel images.
    cap = 64 * 1024 * 1024 * 3
    out = np.empty(cap, np.uint8)
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    buf = (ctypes.c_uint8 * len(raw)).from_buffer_copy(raw)
    for fn in (lib.sdbl_decode_jpeg, lib.sdbl_decode_png):
        rc = fn(
            buf, ctypes.c_int64(len(raw)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int64(cap),
            ctypes.byref(w), ctypes.byref(h),
        )
        if rc == 0:
            return out[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()
    return None


def _native_resize_crop(lib, img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    dst = np.empty((size, size, 3), np.uint8)
    rc = lib.sdbl_resize_center_crop(
        np.ascontiguousarray(img).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(w), ctypes.c_int32(h), ctypes.c_int32(size),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise RuntimeError(f"native resize failed rc={rc}")
    return dst


def read_image(path: str | Path, image_size: Optional[int] = None) -> np.ndarray:
    """HWC float32 RGB in [0, 1]; resized+cropped to square if image_size."""
    raw = Path(path).read_bytes()
    lib = load_dataio()
    img = _native_decode(lib, raw) if lib is not None else None
    if img is None:  # PIL fallback (or non-JPEG/PNG format)
        from PIL import Image
        import io

        img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
    if image_size is not None and img.shape[:2] != (image_size, image_size):
        if lib is not None:
            img = _native_resize_crop(lib, img, image_size)
        else:
            from PIL import Image

            pil = Image.fromarray(img)
            scale = image_size / min(pil.size)
            pil = pil.resize(
                (round(pil.width * scale), round(pil.height * scale)), Image.BILINEAR
            )
            left = (pil.width - image_size) // 2
            top = (pil.height - image_size) // 2
            img = np.asarray(pil.crop((left, top, left + image_size, top + image_size)))
    return img.astype(np.float32) / 255.0


def encode_png_bytes(image: np.ndarray) -> bytes:
    """HWC uint8 / float-[0,1] image -> PNG bytes, through the native C++
    encoder (runtime/dataio.cpp::sdbl_encode_png) with a PIL fallback —
    the serving hot path (serving/server.py)."""
    if image.dtype != np.uint8:
        image = np.clip(np.asarray(image, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    image = np.ascontiguousarray(image)
    lib = load_dataio()
    if lib is not None and image.ndim == 3 and image.shape[2] == 3:
        h, w = image.shape[:2]
        cap = h * w * 3 + (1 << 16)
        out = np.empty(cap, np.uint8)
        n = lib.sdbl_encode_png(
            image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int32(w), ctypes.c_int32(h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int64(cap),
        )
        if n > 0:
            return out[:n].tobytes()
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(image).save(buf, format="PNG")
    return buf.getvalue()


def write_png(path: str | Path, image: np.ndarray) -> None:
    """image: HWC uint8 or float in [0, 1]."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(encode_png_bytes(image))
