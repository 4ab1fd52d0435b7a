"""Native data-loading components (C++ via ctypes, lazily compiled).

The reference's slowest host-side paths are np.loadtxt over the 78MB
binarized-mnist amat files (reference datasets/sbmnist.py:55-58) and the
torchvision idx readers. Here:

- ``load_amat``: one-pass C++ parser (amat_parser.cpp), ~2x np.loadtxt.
- ``load_idx_images`` / ``load_idx_labels``: zero-copy numpy views over the
  big-endian idx format (yann.lecun.com layout) — header via struct,
  payload via np.frombuffer; no native code needed to hit memory bandwidth.

The shared library is compiled on first use with g++ -O3 into this package
directory (gitignored); if the toolchain is missing, ``_load`` returns None
and ``load_amat`` falls back to np.loadtxt so the framework still works.
"""

import ctypes
import os
import struct
import subprocess
import threading

import numpy as np

__all__ = ["load_amat", "load_idx_images", "load_idx_labels", "_load"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "amat_parser.cpp")
_LIB = os.path.join(_HERE, "_amat_parser.so")
_lock = threading.Lock()
_cached = None
_failed = False


def _load():
    """Compile (once) and dlopen the native parser; None if unavailable."""
    global _cached, _failed
    with _lock:
        if _cached is not None or _failed:
            return _cached
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB)
            lib.amat_parse.argtypes = [ctypes.c_char_p]
            lib.amat_parse.restype = ctypes.c_longlong
            lib.amat_fetch.argtypes = [
                ctypes.POINTER(ctypes.c_float)]
            lib.amat_fetch.restype = None
            _cached = lib
        except (OSError, subprocess.SubprocessError):
            _failed = True
            _cached = None
        return _cached


def load_amat(path, n_cols=None):
    """Parse a whitespace-separated text matrix into float32 [N, n_cols].

    ``n_cols`` is inferred from the first line when omitted. The parse is a
    single flat pass (row structure is not trusted beyond the first line,
    matching loadtxt's behavior for rectangular files).
    """
    if n_cols is None:
        with open(path, "r") as f:
            first = f.readline()
        n_cols = len(first.split())
        if n_cols == 0:
            raise ValueError(f"empty amat file: {path}")
    lib = _load()
    if lib is None:  # toolchain missing: still correct, just slower
        flat = np.loadtxt(path, dtype=np.float32).reshape(-1)
    else:
        # The C++ side stores parse results in a process-global buffer, so
        # the parse+fetch pair must be atomic across threads.
        with _lock:
            count = lib.amat_parse(path.encode())
            if count < 0:
                raise OSError(f"cannot read amat file: {path}")
            flat = np.empty(int(count), np.float32)
            lib.amat_fetch(flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if flat.size % n_cols:
        raise ValueError(
            f"{path}: {flat.size} values not divisible by n_cols={n_cols}")
    return flat.reshape(-1, n_cols)


def _read_idx(path, magic_expected):
    with open(path, "rb") as f:
        header = f.read(4)
        if len(header) < 4:
            return None
        magic = struct.unpack(">I", header)[0]
        if magic != magic_expected:
            return None
        ndim = magic & 0xFF
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        payload = np.frombuffer(f.read(), dtype=np.uint8)
    if payload.size != int(np.prod(dims)):
        return None
    return payload.reshape(dims)


def load_idx_images(path):
    """idx3-ubyte images → float32 [N, H*W] in [0, 1]; None if not idx3."""
    if not os.path.exists(path):
        return None
    arr = _read_idx(path, 2051)
    if arr is None:
        return None
    n = arr.shape[0]
    return (arr.reshape(n, -1).astype(np.float32)) / 255.0


def load_idx_labels(path):
    """idx1-ubyte labels → int64 [N]; None if not idx1."""
    if not os.path.exists(path):
        return None
    arr = _read_idx(path, 2049)
    if arr is None:
        return None
    return arr.astype(np.int64)
