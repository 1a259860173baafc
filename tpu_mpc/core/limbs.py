"""Limb representation of big integers for TPU kernels.

A W-bit unsigned integer is stored little-endian as L = W/16 "limbs" of 16
bits, each held in a uint32 lane.  16-bit limbs are the sweet spot for the
TPU VPU: a 16x16-bit product fits exactly in a uint32 (no 64-bit integer
types exist on TPU), and partial-product columns can accumulate thousands of
split 16-bit halves in a uint32 before any carry propagation is needed.

This module is the host-side bridge: python int <-> numpy limb arrays.
Device-side arithmetic on these arrays lives in bigint.py / montgomery.py.

Replaces the role of `curv::BigInt` (GMP-backed) in the reference
(e.g. /root/reference/src/utilities/mta/range_proofs.rs:48-57) with a
fixed-shape, batch-first representation.
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1

# Standard width classes used across the framework (bits).
W256, W512, W1024, W2048, W3072, W4096 = 256, 512, 1024, 2048, 3072, 4096


def nlimbs(bits: int) -> int:
    """Number of 16-bit limbs for a width of `bits` bits."""
    return (bits + LIMB_BITS - 1) // LIMB_BITS


def to_limbs(x: int, L: int) -> np.ndarray:
    """Encode a non-negative python int into L little-endian 16-bit limbs."""
    if x < 0:
        raise ValueError("to_limbs requires non-negative input")
    if x >> (LIMB_BITS * L):
        raise ValueError(f"value does not fit in {L} limbs ({x.bit_length()} bits)")
    # int.to_bytes is C speed; frombuffer avoids a python-level limb loop
    return np.frombuffer(x.to_bytes(2 * L, "little"), dtype="<u2").astype(np.uint32)


def from_limbs(a) -> int:
    """Decode a 1-D little-endian limb array into a python int.

    Accepts non-canonical (column) values as well: each entry is simply
    weighted by 2^(16*i), so lazy-carry representations decode correctly.
    """
    a = np.asarray(a)
    if a.dtype == np.uint32 and a.ndim == 1 and bool(np.all(a <= LIMB_MASK)):
        return int.from_bytes(a.astype("<u2").tobytes(), "little")
    x = 0
    for i in reversed(range(a.shape[-1])):
        x = (x << LIMB_BITS) + int(a[..., i])
    return x


def batch_to_limbs(xs, L: int) -> np.ndarray:
    """Encode a (nested) list of python ints into an [..., L] limb array."""
    from . import modctx as _m

    t0 = _m.time.perf_counter() if _m.PROFILE else 0.0
    arr = np.asarray(xs, dtype=object)
    out = np.zeros(arr.shape + (L,), dtype=np.uint32)
    flat_in = arr.reshape(-1)
    flat_out = out.reshape(-1, L)
    for i, v in enumerate(flat_in):
        flat_out[i] = to_limbs(int(v), L)
    if _m.PROFILE:
        _m.PROFILE_LOG.append(
            ("host:to_limbs", flat_in.shape[0], L * 16, "-",
             _m.time.perf_counter() - t0)
        )
    return out


def batch_from_limbs(a) -> np.ndarray:
    """Decode an [..., L] limb array into an object array of python ints."""
    from . import modctx as _m

    t0 = _m.time.perf_counter() if _m.PROFILE else 0.0
    a = np.asarray(a)
    lead = a.shape[:-1]
    flat = a.reshape(-1, a.shape[-1])
    if flat.dtype == np.uint32 and bool(np.all(flat <= LIMB_MASK)):
        # vectorized canonical path: one buffer, C-speed per-row decode
        buf = flat.astype("<u2").tobytes()
        k = 2 * flat.shape[1]
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            out[i] = int.from_bytes(buf[i * k : (i + 1) * k], "little")
    else:
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            out[i] = from_limbs(flat[i])
    if _m.PROFILE:
        _m.PROFILE_LOG.append(
            ("host:from_limbs", flat.shape[0], flat.shape[1] * 16, "-",
             _m.time.perf_counter() - t0)
        )
    return out.reshape(lead) if lead else out[0]
