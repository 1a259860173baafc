"""ModCtx: host-int + device-Montgomery pairing for a batch of moduli.

The ZK layer works in a hybrid split:
  * modexps (the expensive part) run batched on device via mont_exp;
  * multiplies/inversions/hashes (cheap, or data-dependent) run on host ints.

ModCtx owns one batch of moduli in both forms and provides `pow` with
canonical batch shapes + a fixed ladder of exponent-width classes, so the
whole framework shares a small set of compiled modexp kernels.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

import os
import time

from .limbs import batch_from_limbs, batch_to_limbs, nlimbs
from .montgomery import (
    MontCtx,
    make_fixed_table,
    mont_exp,
    mont_exp_fixed_prod,
    mont_exp_prod,
)

# Launch profiling (enable with TPU_MPC_PROFILE=1): records one row per
# device modexp launch — the dominant cost of every protocol round — so the
# bench can report exactly where wall-clock goes.
PROFILE = bool(int(os.environ.get("TPU_MPC_PROFILE", "0")))
PROFILE_LOG: list[tuple] = []  # (kind, flat_batch, mod_bits, ebits, seconds)


def prof_call(kind: str, batch: int, bits: int, fn):
    """PROFILE-mode helper for non-modexp launches (EC, decrypt): time the
    call with a blocking sync so async dispatch is attributed correctly."""
    if not PROFILE:
        return fn()
    import jax

    t0 = time.perf_counter()
    out = fn()
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, out
    )
    PROFILE_LOG.append((kind, batch, bits, "-", time.perf_counter() - t0))
    return out


def profile_summary(reset: bool = True) -> str:
    rows = {}
    for kind, b, bits, ebs, dt in PROFILE_LOG:
        key = (kind, bits, ebs)
        n, tot = rows.get(key, (0, 0.0))
        rows[key] = (n + 1, tot + dt)
    lines = [
        f"{kind:9s} mod={bits:5d} ebits={str(ebs):18s} calls={n:4d} total={tot:8.2f}s"
        for (kind, bits, ebs), (n, tot) in sorted(rows.items(), key=lambda kv: -kv[1][1])
    ]
    total = sum(dt for *_, dt in PROFILE_LOG)
    lines.append(f"TOTAL modexp launches: {len(PROFILE_LOG)}  {total:.2f}s")
    if reset:
        PROFILE_LOG.clear()
    return "\n".join(lines)

# exponent-width ladder (bits): actual exponents are zero-padded up to the
# next class; extra windows square zeros, costing ~0-15% over exact width.
EBITS_CLASSES = (
    16, 64, 256, 512, 776, 1024, 1552, 2048, 2320, 2576, 2832, 3104, 4096
)

_MIN_BATCH = 4


def ebits_class(bits: int) -> int:
    for c in EBITS_CLASSES:
        if bits <= c:
            return c
    raise ValueError(f"exponent too wide: {bits} bits")


def _next_pow2(n: int) -> int:
    p = _MIN_BATCH
    while p < n:
        p *= 2
    return p


def _flatten_pad(a, batch_shape):
    a = jnp.broadcast_to(a, batch_shape + a.shape[len(batch_shape):]) if batch_shape else a
    lead = int(np.prod(batch_shape)) if batch_shape else 1
    flat = a.reshape((lead,) + a.shape[len(batch_shape):])
    Bp = _next_pow2(lead)
    if Bp != lead:
        pad = jnp.broadcast_to(flat[0:1], (Bp - lead,) + flat.shape[1:])
        flat = jnp.concatenate([flat, pad], axis=0)
    # multi-chip: partition the flattened batch over the active sessions
    # mesh (no-op single-chip).  Inputs sharded => XLA compiles the modexp
    # SPMD across the mesh; sessions are independent, so no collectives.
    from ..sharding import mesh as _mesh

    return _mesh.shard_flat(flat)


# RNS backend for plain pow (core/rns.py, MXU path): opt-in via env while
# the CIOS kernel remains the default; pow_prod/pow_fixed_prod stay CIOS.
USE_RNS = bool(int(os.environ.get("TPU_MPC_RNS", "0")))


@dataclasses.dataclass
class ModCtx:
    """A batch of moduli: host ints [..] + device MontCtx (limbs [.., L])."""

    n_ints: np.ndarray            # object ndarray of python ints
    ctx: MontCtx
    bits: int
    _rns: object = None           # lazy RnsCtx (only if USE_RNS)

    def rns_ctx(self):
        if self._rns is None:
            from .rns import RnsCtx

            self._rns = RnsCtx.from_ints(self.n_ints, self.bits)
        return self._rns

    @classmethod
    def from_ints(cls, ns, bits: int) -> "ModCtx":
        ns = np.asarray(ns, dtype=object)
        out = cls(n_ints=ns, ctx=MontCtx.from_ints(ns, bits), bits=bits)
        if USE_RNS:
            # build eagerly at the root so take/tile/expand views inherit the
            # constants as index ops instead of re-deriving them per pass
            out.rns_ctx()
        return out

    @property
    def batch_shape(self):
        return self.n_ints.shape

    def take(self, indices, axis: int) -> "ModCtx":
        """Select a sub-batch along a batch axis (e.g. the signer subset)."""
        return ModCtx(
            n_ints=np.take(self.n_ints, indices, axis=axis),
            ctx=MontCtx(
                *(jnp.take(a, jnp.asarray(indices), axis=axis) for a in
                  (self.ctx.n, self.ctx.n0inv, self.ctx.r2, self.ctx.rone))
            ),
            bits=self.bits,
            _rns=self._rns.map_batch(
                lambda a: jnp.take(a, jnp.asarray(indices), axis=axis)
            ) if self._rns is not None else None,
        )

    def tile(self, S: int) -> "ModCtx":
        """Broadcast a leading batch axis of size 1 to size S."""
        tile_np = lambda a: np.broadcast_to(a, (S,) + a.shape[1:]).copy()
        tile_dev = lambda a: jnp.broadcast_to(a, (S,) + a.shape[1:])
        return ModCtx(
            n_ints=tile_np(self.n_ints),
            ctx=MontCtx(
                *(tile_dev(c) for c in (self.ctx.n, self.ctx.n0inv, self.ctx.r2, self.ctx.rone))
            ),
            bits=self.bits,
            _rns=self._rns.map_batch(tile_dev) if self._rns is not None else None,
        )

    def expand(self, axis: int) -> "ModCtx":
        """Insert a broadcast batch axis (for pair-matrix layouts)."""
        return ModCtx(
            n_ints=np.expand_dims(self.n_ints, axis),
            ctx=MontCtx(
                *(jnp.expand_dims(a, axis) for a in
                  (self.ctx.n, self.ctx.n0inv, self.ctx.r2, self.ctx.rone))
            ),
            bits=self.bits,
            _rns=self._rns.map_batch(lambda a: jnp.expand_dims(a, axis))
            if self._rns is not None else None,
        )

    def pow(self, base_ints, exp_ints, ebits_hint: int | None = None) -> np.ndarray:
        """(base ** exp) mod n, batched on device.  All inputs are object
        ndarrays of ints (broadcast against the modulus batch).  Exponents
        must be non-negative and < 2^ebits_hint (default: measured)."""
        base = np.asarray(base_ints, dtype=object)
        expv = np.asarray(exp_ints, dtype=object)
        shape = np.broadcast_shapes(base.shape, expv.shape, self.batch_shape)
        base = np.broadcast_to(base, shape)
        expv = np.broadcast_to(expv, shape)
        if ebits_hint is None:
            flat = expv.reshape(-1)
            ebits_hint = max((int(v).bit_length() for v in flat.tolist()), default=1)
        eb = ebits_class(max(ebits_hint, 1))
        if USE_RNS:
            from . import rns

            t0 = time.perf_counter() if PROFILE else 0.0
            res = rns.rns_exp(self.rns_ctx(), self.n_ints, base, expv, eb)
            if PROFILE:
                PROFILE_LOG.append(
                    ("pow_rns", int(np.prod(shape)) if shape else 1, self.bits, eb,
                     time.perf_counter() - t0)
                )
            return res
        L = nlimbs(self.bits)
        Le = nlimbs(eb)
        x = jnp.asarray(batch_to_limbs(np.mod(base, np.broadcast_to(self.n_ints, shape)), L))
        e = jnp.asarray(batch_to_limbs(expv, Le))
        xf = _flatten_pad(x, shape)
        ef = _flatten_pad(e, shape)
        # ctx arrays broadcast right-aligned to the operand batch (the ctx
        # batch shape must be numpy-broadcast-compatible with `shape`)
        bc = lambda a: _flatten_pad(jnp.broadcast_to(a, shape + a.shape[-1:]), shape)
        ctxf = MontCtx(bc(self.ctx.n), bc(self.ctx.n0inv), bc(self.ctx.r2), bc(self.ctx.rone))
        t0 = time.perf_counter() if PROFILE else 0.0
        out = mont_exp(xf, ef, ctxf, ebits=eb)
        lead = int(np.prod(shape)) if shape else 1
        res_limbs = np.asarray(out[:lead])
        if PROFILE:
            PROFILE_LOG.append(("pow", xf.shape[0], self.bits, eb, time.perf_counter() - t0))
        res = batch_from_limbs(res_limbs)
        return res.reshape(shape) if shape else res

    def make_tables(self, bases, max_ebits: int) -> jnp.ndarray:
        """Precompute fixed-base window tables for long-lived bases.

        bases: object ndarray [k, ...batch] (k bases, e.g. (h1, h2)).
        Returns a device array [nw, 16, k, ...batch, L] usable by
        pow_fixed_prod for any exponent width up to max_ebits.  One launch
        builds all k tables (reference hot pattern: the ring-Pedersen h1/h2
        of range_proofs.rs:58-67 are fixed for the life of a key)."""
        nw = -(-ebits_class(max_ebits) // 4)
        L = nlimbs(self.bits)
        b = np.asarray(bases, dtype=object)
        n_b = np.broadcast_to(self.n_ints, b.shape)
        x = jnp.asarray(batch_to_limbs(np.mod(b, n_b), L))
        return make_fixed_table(x, self.ctx, nw)

    def pow_fixed_prod(self, tables, exps, ebits_hints) -> np.ndarray:
        """prod_i base_i^exps[i] mod n from precomputed window tables —
        zero squarings (the per-window chain is just one montmul per base).

        tables: sequence of [nw, 16, ...tbatch, L] device arrays whose tbatch
        broadcasts against the exponent batch (build via make_tables; index
        its k axis).  exps: sequence of object ndarrays.  ebits_hints are
        REQUIRED (never measured — exponents here are usually secrets or
        attacker-controlled proof fields; ADVICE r1)."""
        exps = [np.asarray(e, dtype=object) for e in exps]
        shape = np.broadcast_shapes(self.batch_shape, *(e.shape for e in exps))
        ebs = [ebits_class(max(h, 1)) for h in ebits_hints]
        from ..sharding import mesh as _mesh

        ef = tuple(
            _mesh.shard_leading(
                jnp.asarray(batch_to_limbs(np.broadcast_to(e, shape), nlimbs(eb))), shape
            )
            for e, eb in zip(exps, ebs)
        )
        t0 = time.perf_counter() if PROFILE else 0.0
        out = mont_exp_fixed_prod(tuple(tables), ef, self.ctx, ebits_list=tuple(ebs))
        out = jnp.broadcast_to(out, shape + out.shape[-1:])
        res_limbs = np.asarray(out)
        if PROFILE:
            PROFILE_LOG.append(
                ("pow_fixed", int(np.prod(shape)) if shape else 1, self.bits,
                 tuple(ebs), time.perf_counter() - t0)
            )
        return batch_from_limbs(res_limbs)

    def pow_prod(self, bases, exps, ebits_hints=None) -> np.ndarray:
        """prod_i bases[i]**exps[i] mod n in ONE device launch with shared
        squarings (Straus).  bases/exps: sequences of object ndarrays.  This
        is the fast path for ring-Pedersen commitments h1^a h2^b and for
        folding the extra z^e / c^e factors of the verify equations."""
        bases = [np.asarray(b, dtype=object) for b in bases]
        exps = [np.asarray(e, dtype=object) for e in exps]
        shape = np.broadcast_shapes(
            self.batch_shape, *(b.shape for b in bases), *(e.shape for e in exps)
        )
        ebs = []
        for k, e in enumerate(exps):
            hint = None if ebits_hints is None else ebits_hints[k]
            if hint is None:
                flat = np.broadcast_to(e, shape).reshape(-1)
                hint = max((int(v).bit_length() for v in flat.tolist()), default=1)
            ebs.append(ebits_class(max(hint, 1)))
        L = nlimbs(self.bits)
        n_b = np.broadcast_to(self.n_ints, shape)
        xf = tuple(
            _flatten_pad(jnp.asarray(batch_to_limbs(np.mod(np.broadcast_to(b, shape), n_b), L)), shape)
            for b in bases
        )
        ef = tuple(
            _flatten_pad(jnp.asarray(batch_to_limbs(np.broadcast_to(e, shape), nlimbs(eb))), shape)
            for e, eb in zip(exps, ebs)
        )
        bc = lambda a: _flatten_pad(jnp.broadcast_to(a, shape + a.shape[-1:]), shape)
        ctxf = MontCtx(bc(self.ctx.n), bc(self.ctx.n0inv), bc(self.ctx.r2), bc(self.ctx.rone))
        t0 = time.perf_counter() if PROFILE else 0.0
        out = mont_exp_prod(xf, ef, ctxf, ebits_list=tuple(ebs))
        lead = int(np.prod(shape)) if shape else 1
        res_limbs = np.asarray(out[:lead])
        if PROFILE:
            PROFILE_LOG.append(("pow_prod", xf[0].shape[0], self.bits, tuple(ebs), time.perf_counter() - t0))
        res = batch_from_limbs(res_limbs)
        return res.reshape(shape) if shape else res
