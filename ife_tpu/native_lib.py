"""ctypes loader for the native host-runtime library (native/libife_native.so).

Native components mirror the reference's compiled libs (libIO/libHR2Reader,
reference src/IO/CMakeLists.txt:1-8): HR2 codec + threaded histogram
binning. Everything has a pure-Python fallback; `lib()` returns None when
the library isn't built, and callers fall back silently.

Build with: make -C native
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libife_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


class Hr2Info(ctypes.Structure):
    _fields_ = [
        ("size", ctypes.c_int64 * 3),
        ("origin", ctypes.c_double * 3),
        ("spacing", ctypes.c_double * 3),
        ("is_float", ctypes.c_int32),
    ]


def build(force: bool = False) -> bool:
    """Build the native library (used by tests/CI). Returns success."""
    if os.path.exists(_SO_PATH) and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_REPO_ROOT, "native")],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        return None
    try:
        L = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    L.ife_free.argtypes = [ctypes.c_void_p]
    L.ife_hr2_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(Hr2Info),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_char_p, ctypes.c_int,
    ]
    L.ife_hr2_read.restype = ctypes.c_int
    L.ife_hr2_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(Hr2Info),
        ctypes.POINTER(ctypes.c_float), ctypes.c_char_p, ctypes.c_int,
    ]
    L.ife_hr2_write.restype = ctypes.c_int
    L.ife_histogram.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
    ]
    L.ife_histogram_channels.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
    ]
    for fn in ("ife_jll_decode", "ife_jls_decode"):
        if hasattr(L, fn):  # older builds may predate either decoder
            f = getattr(L, fn)
            f.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int32, ctypes.c_int32,
            ]
            f.restype = ctypes.c_int
    _lib = L
    return _lib


# ---------------------------------------------------------------------------
# high-level wrappers (None / fallback handled by callers)
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402


def hr2_read_native(path: str):
    """(data (X,Y,Z) float32, spacing, origin) or None if lib unavailable."""
    L = lib()
    if L is None:
        return None
    info = Hr2Info()
    data_p = ctypes.POINTER(ctypes.c_float)()
    err = ctypes.create_string_buffer(256)
    rc = L.ife_hr2_read(path.encode(), ctypes.byref(info),
                        ctypes.byref(data_p), err, 256)
    if rc != 0:
        raise ValueError(f"HR2 read failed: {err.value.decode()}")
    n = info.size[0] * info.size[1] * info.size[2]
    flat = np.ctypeslib.as_array(data_p, shape=(n,)).copy()
    L.ife_free(data_p)
    # payload is x fastest -> file order (z, y, x); transpose to (X, Y, Z)
    arr = flat.reshape(info.size[2], info.size[1], info.size[0]).transpose(2, 1, 0)
    return (
        np.ascontiguousarray(arr),
        tuple(info.spacing),
        tuple(info.origin),
    )


def hr2_write_native(path: str, data: np.ndarray, spacing, origin,
                     pixel_type: str = "float") -> bool:
    L = lib()
    if L is None:
        return False
    info = Hr2Info()
    for d in range(3):
        info.size[d] = data.shape[d]
        info.spacing[d] = float(spacing[d])
        info.origin[d] = float(origin[d])
    info.is_float = 1 if pixel_type == "float" else 0
    flat = np.ascontiguousarray(
        np.asarray(data, dtype=np.float32).transpose(2, 1, 0)
    ).reshape(-1)
    err = ctypes.create_string_buffer(256)
    rc = L.ife_hr2_write(
        path.encode(), ctypes.byref(info),
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), err, 256,
    )
    if rc != 0:
        raise ValueError(f"HR2 write failed: {err.value.decode()}")
    return True


def histogram_native(values: np.ndarray, edges: np.ndarray,
                     mask: np.ndarray | None = None):
    """(n_edges+1,) uint64 counts, or None if lib unavailable."""
    L = lib()
    if L is None:
        return None
    v = np.ascontiguousarray(values, dtype=np.float32).reshape(-1)
    e = np.ascontiguousarray(edges, dtype=np.float64)
    counts = np.zeros(e.size + 1, dtype=np.uint64)
    m_ptr = None
    if mask is not None:
        m = np.ascontiguousarray(mask, dtype=np.uint8).reshape(-1)
        if m.size != v.size:
            raise ValueError("mask size mismatch")
        m_ptr = m.ctypes.data_as(ctypes.c_void_p)
    L.ife_histogram(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.size,
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), e.size,
        m_ptr, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return counts


def histogram_channels_native(values: np.ndarray, edges: np.ndarray,
                              mask: np.ndarray | None = None):
    """values (N, H), edges (H, E) -> (H, E+1) uint64 counts, or None."""
    L = lib()
    if L is None:
        return None
    v = np.ascontiguousarray(values, dtype=np.float32)
    if v.ndim != 2:
        raise ValueError("values must be (N, H)")
    n, h = v.shape
    e = np.ascontiguousarray(edges, dtype=np.float64)
    if e.shape[0] != h:
        raise ValueError("edges must be (H, E)")
    counts = np.zeros((h, e.shape[1] + 1), dtype=np.uint64)
    m_ptr = None
    if mask is not None:
        m = np.ascontiguousarray(mask, dtype=np.uint8).reshape(-1)
        if m.size != n:
            raise ValueError("mask size mismatch")
        m_ptr = m.ctypes.data_as(ctypes.c_void_p)
    L.ife_histogram_channels(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, h,
        e.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), e.shape[1],
        m_ptr, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return counts


def jll_decode_native(data: bytes, rows: int, cols: int):
    """Decode a JPEG Lossless SV1 frame via the C++ decoder; (rows, cols)
    uint16 array, or None when the library (or symbol) is unavailable.
    Raises ValueError on malformed streams (same classes the Python
    decoder rejects)."""
    L = lib()
    if L is None or not hasattr(L, "ife_jll_decode"):
        return None
    out = np.empty((rows, cols), dtype=np.uint16)
    rc = L.ife_jll_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        rows, cols,
    )
    if rc != 0:
        raise ValueError(f"JPEG lossless decode failed (native rc={rc})")
    return out


def jls_decode_native(data: bytes, rows: int, cols: int):
    """Decode a single-component JPEG-LS (T.87) stream via the C++
    decoder; (rows, cols) uint16 array, or None when the library (or
    symbol) is unavailable. Raises ValueError on malformed streams
    (same classes the Python decoder rejects)."""
    L = lib()
    if L is None or not hasattr(L, "ife_jls_decode"):
        return None
    out = np.empty((rows, cols), dtype=np.uint16)
    rc = L.ife_jls_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        rows, cols,
    )
    if rc != 0:
        raise ValueError(f"JPEG-LS decode failed (native rc={rc})")
    return out
