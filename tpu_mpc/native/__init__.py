"""ctypes bindings for the native (C++) helpers.

Builds lazily with g++ on first import if the shared object is missing
(no pybind11 in this environment; ctypes keeps the binding dependency-free).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libprimegen.so")
_SRC = os.path.join(_DIR, "primegen.cpp")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.tpu_mpc_gen_prime.argtypes = [ctypes.c_int, ctypes.c_uint64, ctypes.c_char_p]
        lib.tpu_mpc_gen_prime.restype = ctypes.c_int
        lib.tpu_mpc_is_prime.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64]
        lib.tpu_mpc_is_prime.restype = ctypes.c_int
        lib.tpu_mpc_gen_safe_prime.argtypes = [
            ctypes.c_int, ctypes.c_uint64, ctypes.c_char_p
        ]
        lib.tpu_mpc_gen_safe_prime.restype = ctypes.c_int
        _lib = lib
    return _lib


_HM_SO = os.path.join(_DIR, "libhostmul.so")
_HM_SRC = os.path.join(_DIR, "hostmul.cpp")
_hm_lib = None
_hm_failed = False


def _load_hostmul():
    """GMP-backed batch mulmod helper; returns None when libgmp or the
    toolchain is unavailable (callers fall back to the python loop)."""
    global _hm_lib, _hm_failed
    if _hm_lib is not None or _hm_failed:
        return _hm_lib
    with _lock:
        if _hm_lib is not None or _hm_failed:
            return _hm_lib
        try:
            gmp = "/usr/lib/x86_64-linux-gnu/libgmp.so.10"
            if not os.path.exists(gmp):
                raise FileNotFoundError(gmp)
            if (not os.path.exists(_HM_SO)
                    or os.path.getmtime(_HM_SO) < os.path.getmtime(_HM_SRC)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _HM_SO,
                     _HM_SRC, gmp, "-lpthread"],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_HM_SO)
            lib.tpu_mpc_mulmod_batch.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ]
            lib.tpu_mpc_mulmod_batch.restype = ctypes.c_int
            lib.tpu_mpc_prodmod_axis0.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p,
                ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ]
            lib.tpu_mpc_prodmod_axis0.restype = ctypes.c_int
            _hm_lib = lib
        except Exception:
            _hm_failed = True
    return _hm_lib


class hostmul:
    """GMP-backed batched modular products (see hostmul.cpp)."""

    @staticmethod
    def available() -> bool:
        return _load_hostmul() is not None

    @staticmethod
    def mulmod_batch(op_bufs: list, mod_buf: bytes, B: int, W: int) -> bytes:
        lib = _load_hostmul()
        ops = b"".join(op_bufs)
        out = ctypes.create_string_buffer(B * W)
        rc = lib.tpu_mpc_mulmod_batch(ops, len(op_bufs), mod_buf, out, B, W)
        if rc != 0:
            raise RuntimeError("mulmod_batch failed")
        return out.raw

    @staticmethod
    def prodmod_axis0(vals_buf: bytes, S: int, mod_buf: bytes,
                      J: int, W: int) -> bytes:
        lib = _load_hostmul()
        out = ctypes.create_string_buffer(J * W)
        rc = lib.tpu_mpc_prodmod_axis0(vals_buf, S, mod_buf, out, J, W)
        if rc != 0:
            raise RuntimeError("prodmod_axis0 failed")
        return out.raw


class primegen:
    """Namespace mirroring the python-side API (tpu_mpc.host.primes)."""

    @staticmethod
    def gen_prime(bits: int, seed: int) -> int | None:
        if bits % 64 != 0 or bits < 128:
            return None  # caller falls back to the python path
        lib = _load()
        buf = ctypes.create_string_buffer(bits // 8)
        if lib.tpu_mpc_gen_prime(bits, seed & ((1 << 64) - 1), buf) != 0:
            return None
        return int.from_bytes(buf.raw, "little")

    @staticmethod
    def gen_safe_prime(bits: int, seed: int) -> int | None:
        if bits % 64 != 0 or bits < 128:
            return None  # caller falls back to the python path
        lib = _load()
        buf = ctypes.create_string_buffer(bits // 8)
        if lib.tpu_mpc_gen_safe_prime(bits, seed & ((1 << 64) - 1), buf) != 0:
            return None
        return int.from_bytes(buf.raw, "little")

    @staticmethod
    def is_prime(n: int, seed: int = 1) -> bool:
        lib = _load()
        nbytes = max(1, (n.bit_length() + 7) // 8)
        nbytes = ((nbytes + 7) // 8) * 8  # whole 64-bit words
        data = n.to_bytes(nbytes, "little")
        return lib.tpu_mpc_is_prime(data, nbytes, seed) == 1
