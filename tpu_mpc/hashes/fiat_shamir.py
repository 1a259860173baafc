"""Batched Fiat-Shamir hashing (host-side SHA-256 over session batches).

The curv convention (DigestExt, used for every challenge in the reference —
e.g. range_proofs.rs:143-150, zk_pdl_with_slack/mod.rs:102-110):
each value is appended as its minimal big-endian byte string; EC points as
33-byte SEC1 compressed (equivalent to chain_bigint of the bytes as an int,
since the 02/03 prefix is never zero).

hashlib is C-speed (~1 GB/s); at a few KB per session this stays <5% of a
round's budget even at 4096 sessions, so host hashing between device kernels
is the right v1 split.  Device-side batched SHA-256 is a later optimization.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..ec import secp256k1 as ec
from ..host import ec as hec
from ..host.serde import bigint_to_bytes

Q = hec.N


def point_hash_ints(P: ec.Point) -> np.ndarray:
    """Device point batch -> object array of ints (compressed-bytes-as-int)."""
    return point_hash_ints_many(P)[0]


def point_hash_ints_many(*Ps: ec.Point) -> list:
    """Compressed-int encodings of SEVERAL point batches in ONE device
    launch + ONE host sync.

    Every to_affine costs a full fe_inv (a ~255-squaring chain) and a
    blocking device->host read; hashing a sigma-protocol statement point by
    point was the single largest launch source in the r1 profile.  Stacking
    all points of a challenge into one batch amortizes both."""
    import jax.numpy as jnp

    batch = np.broadcast_shapes(*(p.X.shape[:-1] for p in Ps))
    Lc = Ps[0].X.shape[-1]
    stacked = ec.Point(
        *(
            jnp.stack([jnp.broadcast_to(getattr(p, c), batch + (Lc,)) for p in Ps])
            for c in ("X", "Y", "Z")
        )
    )
    from ..core.modctx import prof_call

    x, y, inf = prof_call(
        "ec:hashpts", len(Ps) * (int(np.prod(batch)) if batch else 1), 256,
        lambda: ec.to_affine(stacked),
    )
    xs = np.asarray(x)
    parity = (np.asarray(y[..., 0]) & 1).astype(np.uint8)  # limb 0 LSB = y parity
    infs = np.asarray(inf)
    outs = []
    k = xs.shape[1:-1]
    for i in range(len(Ps)):
        fx = xs[i].reshape(-1, Lc)
        fp = parity[i].reshape(-1)
        fi = infs[i].reshape(-1)
        o = np.empty(fx.shape[0], dtype=object)
        for b in range(fx.shape[0]):
            if fi[b]:
                raise ValueError("cannot serialize the identity point")
            xb = int.from_bytes(fx[b].astype("<u2").tobytes(), "little")
            o[b] = ((2 + int(fp[b])) << 256) | xb
        outs.append(o.reshape(k) if k else o[0])
    return outs


def digest_rows(*columns, reduce_mod=None) -> np.ndarray:
    """SHA-256 over rows of chained big-endian-encoded ints.

    Each column is an object ndarray (or scalar int) of python ints; all
    columns broadcast to a common batch shape.  Returns object ndarray of
    ints (optionally reduced mod `reduce_mod`).
    """
    from ..core import modctx as _m

    t0 = _m.time.perf_counter() if _m.PROFILE else 0.0
    cols = [np.asarray(c, dtype=object) for c in columns]
    shape = np.broadcast_shapes(*(c.shape for c in cols))
    cols = [np.broadcast_to(c, shape) for c in cols]
    flat = [c.reshape(-1) for c in cols]
    n = flat[0].shape[0] if shape else 1
    out = np.empty(n, dtype=object)
    for i in range(n):
        h = hashlib.sha256()
        for c in flat:
            h.update(bigint_to_bytes(int(c[i] if shape else c[()])))
        v = int.from_bytes(h.digest(), "big")
        out[i] = v % reduce_mod if reduce_mod else v
    if _m.PROFILE:
        _m.PROFILE_LOG.append(
            ("host:digest", n * len(flat), 0, "-", _m.time.perf_counter() - t0)
        )
    return out.reshape(shape) if shape else out[0]


def commit_rows(msg_ints, blind_ints) -> np.ndarray:
    """Batched curv HashCommitment: H(message || blinding)."""
    return digest_rows(msg_ints, blind_ints)
