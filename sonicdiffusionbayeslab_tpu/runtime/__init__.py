"""Native (C++) host runtime: data IO codecs + transforms.

Built on demand with g++ (no pybind11 in this image — plain C ABI via
ctypes).  The compiled .so is cached next to the source keyed by a source
hash, so the first import pays ~1s of compile once per machine.
"""

from __future__ import annotations

import ctypes
import hashlib
import subprocess
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: Path, out: Path) -> None:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(out), "-lpng", "-ljpeg", "-lz",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_dataio() -> Optional[ctypes.CDLL]:
    """The dataio library, building if needed; None if unbuildable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = _HERE / "dataio.cpp"
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    so = _HERE / f"_dataio_{tag}.so"
    try:
        if not so.exists():
            _build(src, so)
        lib = ctypes.CDLL(str(so))
        lib.sdbl_decode_jpeg.restype = ctypes.c_int
        lib.sdbl_decode_png.restype = ctypes.c_int
        lib.sdbl_resize_center_crop.restype = ctypes.c_int
        lib.sdbl_encode_png.restype = ctypes.c_int64
        if lib.sdbl_version() != 1:
            return None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB
