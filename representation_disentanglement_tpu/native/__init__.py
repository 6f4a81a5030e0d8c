"""Native (C++) host-runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas on the TPU; this package holds the
host-side runtime pieces that benefit from native code — currently the
batched slice-block gather that feeds the input pipeline (the reference
does this as per-sample h5py reads + numpy transposes inside a torch
Dataset, src/util.py:508-516).

Build model: `gather.cpp` is compiled once with `g++ -O3 -shared` into a
cache directory keyed by the source hash, then dlopen'd with ctypes.  If
no compiler is available (or compilation fails) everything degrades to
the pure-numpy path — `gather_blocks` is None and callers fall back.
Set RDT_NATIVE=0 to disable, RDT_NATIVE_THREADS=N to pin the pool size.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "gather.cpp")
_ABI_VERSION = 1


def _cache_dir() -> str:
    root = os.environ.get("RDT_NATIVE_CACHE",
                          os.path.join(tempfile.gettempdir(), "rdt_native"))
    os.makedirs(root, exist_ok=True)
    return root


def _build() -> str | None:
    """Compile gather.cpp -> cached .so; return its path or None."""
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    so = os.path.join(_cache_dir(), f"gather_{digest}.so")
    if os.path.exists(so):
        return so
    tmp = so + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)  # atomic: concurrent builders race benignly
        return so
    except (OSError, subprocess.SubprocessError):
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None


def _load():
    if os.environ.get("RDT_NATIVE", "1") == "0":
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        if lib.rdt_native_abi_version() != _ABI_VERSION:
            return None
        lib.rdt_gather_blocks.restype = ctypes.c_int
        lib.rdt_gather_blocks.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        return lib
    except OSError:
        return None


_LIB = _load()


def available() -> bool:
    return _LIB is not None


def gather_blocks(src_ptrs: np.ndarray, out: np.ndarray) -> None:
    """Fill `out` [n_tasks, H, W, bc] (contiguous float32) from `src_ptrs`
    [n_tasks] uint64 block-start addresses (0 => zero-fill).  Each source
    block is [bc, H, W] contiguous float32; the copy transposes to the
    device layout.  Caller keeps the source arrays alive for the call."""
    assert _LIB is not None
    assert out.dtype == np.float32 and out.flags["C_CONTIGUOUS"]
    n, H, W, bc = out.shape
    ptrs = (ctypes.c_void_p * n)(
        *[ctypes.c_void_p(int(p)) for p in src_ptrs])
    rc = _LIB.rdt_gather_blocks(
        ptrs, out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n), ctypes.c_int64(H), ctypes.c_int64(W),
        ctypes.c_int64(bc))
    if rc != 0:  # pragma: no cover - the kernel only returns 0
        raise RuntimeError(f"rdt_gather_blocks failed: rc={rc}")
