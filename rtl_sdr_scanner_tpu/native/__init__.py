"""Native C++ host runtime acceleration, loaded via ctypes.

The reference's runtime is C++ end to end; here the byte-level host hot paths
(wire codec, IQ format conversion for the data loader) are native too, with
numpy fallbacks so the package works before the library is built.

The shared library builds on first import if a toolchain is present
(g++ -O3 -march=native), cached next to this file.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codec.cpp")
_LIB_PATH = os.path.join(_DIR, "libsdrnative.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.sdr_xor80.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.sdr_cs8_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
    lib.sdr_cu8_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
    lib.sdr_f32_to_cs8.argtypes = [
        ctypes.c_void_p,
        ctypes.c_void_p,
        ctypes.c_size_t,
        ctypes.c_float,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def xor_offset_binary(iq_int8: np.ndarray) -> np.ndarray:
    """int8 array -> uint8 array with every byte XOR 0x80 (offset binary).

    Reference data_controller.cpp:38-40.
    """
    out = np.ascontiguousarray(iq_int8, dtype=np.int8).view(np.uint8).copy()
    lib = _load()
    if lib is not None:
        lib.sdr_xor80(out.ctypes.data, out.size)
    else:
        out ^= 0x80
    return out


def cs8_to_complex64(raw: np.ndarray) -> np.ndarray:
    """Interleaved int8 IQ -> complex64 (scale 1/127.5, converter.py:31)."""
    raw = np.ascontiguousarray(raw, dtype=np.int8)
    lib = _load()
    if lib is not None:
        flat = np.empty(raw.size, dtype=np.float32)
        lib.sdr_cs8_to_f32(raw.ctypes.data, flat.ctypes.data, raw.size)
    else:
        flat = raw.astype(np.float32) / 127.5
    return flat.view(np.complex64) if raw.size % 2 == 0 else flat[:-1].view(np.complex64)


def cu8_to_complex64(raw: np.ndarray) -> np.ndarray:
    """Interleaved uint8 offset-binary IQ -> complex64 (rtl_sdr convention)."""
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        flat = np.empty(raw.size, dtype=np.float32)
        lib.sdr_cu8_to_f32(raw.ctypes.data, flat.ctypes.data, raw.size)
    else:
        flat = (raw.astype(np.float32) - 127.5) / 127.5
    return flat.view(np.complex64)


def complex64_to_cs8(iq: np.ndarray, scale: float = 127.0) -> np.ndarray:
    """complex64 -> interleaved int8 with round+saturate (recorder.cpp:36)."""
    flat = np.ascontiguousarray(iq, dtype=np.complex64).view(np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty(flat.size, dtype=np.int8)
        lib.sdr_f32_to_cs8(flat.ctypes.data, out.ctypes.data, flat.size, scale)
    else:
        out = np.clip(np.round(flat * scale), -128, 127).astype(np.int8)
    return out.reshape(-1, 2)
