"""Build + ctypes binding for the native witness VM (witgen.c).

The shared object is compiled on first use with the system C compiler and
cached next to the source (rebuilt when the source changes).  If no compiler
is available the import degrades gracefully: ``LIB`` is None and the
scheduler falls back to the pure-Python generator path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "witgen.c")

ERR_NAMES = {
    1: "contradictory witness assignment",
    2: "inverse of zero",
    3: "random-access index out of bounds",
    4: "split leftover (value too large for limbs)",
    5: "integer too large for bit split",
    6: "bad opcode",
    7: "swap wire not boolean",
    8: "lookup input not in table",
}


def _build() -> str:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"_witgen_{tag}.so")
    if os.path.exists(so_path):
        return so_path
    for cc in ("cc", "gcc", "clang"):
        try:
            with tempfile.TemporaryDirectory() as td:
                tmp = os.path.join(td, "witgen.so")
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                    check=True, capture_output=True)
                os.replace(tmp, so_path)
            return so_path
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            continue
    raise RuntimeError("no working C compiler")


def _load():
    so = _build()
    lib = ctypes.CDLL(so)
    lib.witgen_run.restype = ctypes.c_uint64
    lib.witgen_run.argtypes = [
        ctypes.c_uint64,                  # p
        ctypes.POINTER(ctypes.c_uint64),  # code
        ctypes.c_uint64,                  # n_instr
        ctypes.POINTER(ctypes.c_uint64),  # pool
        ctypes.POINTER(ctypes.c_uint64),  # values
        ctypes.POINTER(ctypes.c_uint8),   # filled
        ctypes.c_uint64,                  # num_reps
    ]
    lib.witgen_gather.restype = None
    lib.witgen_gather.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),  # values
        ctypes.POINTER(ctypes.c_uint8),   # filled
        ctypes.POINTER(ctypes.c_int64),   # rep map
        ctypes.c_uint64,                  # n
        ctypes.POINTER(ctypes.c_uint64),  # out
    ]
    return lib


try:
    LIB = _load()
except Exception:  # pragma: no cover - toolchain-less environments
    LIB = None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


class WitgenError(Exception):
    def __init__(self, code: int, instr: int):
        self.code = code
        self.instr = instr
        super().__init__(
            f"{ERR_NAMES.get(code, 'error %d' % code)} at instruction "
            f"{instr}")


def run(p: int, code: np.ndarray, pool: np.ndarray, values: np.ndarray,
        filled: np.ndarray, num_reps: int):
    """Execute an instruction stream; raises WitgenError on failure."""
    assert LIB is not None
    assert code.dtype == np.uint64 and code.flags.c_contiguous
    assert pool.dtype == np.uint64 and pool.flags.c_contiguous
    rc = LIB.witgen_run(
        ctypes.c_uint64(p), _ptr(code, ctypes.c_uint64),
        ctypes.c_uint64(len(code) // 5), _ptr(pool, ctypes.c_uint64),
        _ptr(values, ctypes.c_uint64), _ptr(filled, ctypes.c_uint8),
        ctypes.c_uint64(num_reps))
    if rc:
        raise WitgenError(int(rc >> 48), int(rc & ((1 << 48) - 1)))


def gather(values: np.ndarray, filled: np.ndarray, rep: np.ndarray,
           out: np.ndarray):
    assert LIB is not None
    LIB.witgen_gather(_ptr(values, ctypes.c_uint64),
                      _ptr(filled, ctypes.c_uint8),
                      _ptr(rep, ctypes.c_int64),
                      ctypes.c_uint64(len(rep)),
                      _ptr(out, ctypes.c_uint64))
