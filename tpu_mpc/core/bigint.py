"""Vectorized multi-precision integer arithmetic on 16-bit limbs (JAX).

Design rules (TPU-first):
  * constant shapes, no data-dependent control flow — everything jit/vmap-safe;
  * all limbs are uint32 lanes holding values < 2^16 ("canonical") except for
    transient "column" form where a lane may hold any value < 2^31 (lazy
    carries — a 16x16 product split into two 16-bit halves can be accumulated
    thousands of times before overflow);
  * carry propagation is 2 local shift rounds + a log-depth Kogge-Stone
    carry-lookahead (jax.lax.associative_scan) — exact and branch-free.

This layer replaces `curv::BigInt`/GMP in the reference
(/root/reference/src — used everywhere, e.g. utilities/mta/range_proofs.rs:122-141)
with a batch-first formulation: every op maps over arbitrary leading batch
dimensions, so one call processes thousands of MPC sessions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .limbs import LIMB_BITS, LIMB_MASK

U32 = jnp.uint32

# Public ops are jit-wrapped: on this stack, eager per-op dispatch compiles
# each primitive separately (tens of seconds); a jitted graph compiles once
# and dispatches in microseconds.  Inner calls inline into enclosing jits.


def _shift_up_one(x):
    """Multiply a column vector by 2^16: shift limbs one position up.

    The top column is dropped — callers must size the column array so the
    final value fits (documented per call site).
    """
    pad = jnp.zeros(x.shape[:-1] + (1,), dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


@jax.jit
def carry_canon(cols):
    """Canonicalize column form -> canonical 16-bit limbs (same length).

    Input columns must each be < 2^31.  Exact, branch-free:
      round 1/2: local split  x -> (x & 0xffff) + (x >> 16) << 16-limb,
        after which every lane is <= 0x10000;
      then a Kogge-Stone carry-lookahead over the limb axis resolves the
        remaining 0/1 ripple carries in log depth.
    Any carry out of the top limb is dropped (mod 2^(16L)); size accordingly.
    """
    x = cols.astype(U32)
    for _ in range(2):
        lo = x & LIMB_MASK
        hi = x >> LIMB_BITS
        x = lo + _shift_up_one(hi)
    # now x[i] <= 0xffff + 1; binary carry-lookahead
    g = x >> LIMB_BITS                      # generate: in {0, 1}
    p = ((x & LIMB_MASK) == LIMB_MASK).astype(U32)  # propagate

    def op(lo_pair, hi_pair):
        gl, pl = lo_pair
        gh, ph = hi_pair
        return (gh | (ph & gl), ph & pl)

    G, _ = lax.associative_scan(op, (g, p), axis=-1)
    cin = _shift_up_one(G)                  # carry into limb i = carry out of prefix i-1
    return (x + cin) & LIMB_MASK


def zeros_like_cols(batch_shape, L):
    return jnp.zeros(batch_shape + (L,), dtype=U32)


def mul_cols(a, b):
    """Schoolbook product in column (lazy-carry) form.

    a: [..., La], b: [..., Lb] canonical -> [..., La+Lb] columns, each column
    < 2*min(La,Lb)*2^16 <= 2^25 for our max width (256 limbs / 4096 bits).
    """
    La = a.shape[-1]
    Lb = b.shape[-1]
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    out = jnp.zeros(batch + (La + Lb,), dtype=U32)
    if La <= 32:
        # outer product + unrolled static-pad alignment: c[k] = sum_i P[i, k-i].
        # Static pads + adds lower to plain vector ops on TPU; the previous
        # take_along_axis diagonal gather lowered to a per-element gather that
        # made every fe_mul ~100x slower than the arithmetic itself (the r2
        # bench spent 589s of a 630s signing pass inside EC scalar-muls).
        K = La + Lb
        P = a[..., :, None] * b[..., None, :]             # [..., La, Lb] exact
        lo = P & LIMB_MASK
        hi = P >> LIMB_BITS
        nb = [(0, 0)] * (P.ndim - 2)
        acc = jnp.zeros(P.shape[:-2] + (K,), dtype=U32)
        for i in range(La):
            acc = acc + jnp.pad(lo[..., i, :], nb + [(i, K - Lb - i)])
            acc = acc + jnp.pad(hi[..., i, :], nb + [(i + 1, K - Lb - i - 1)])
        return acc

    def body(i, acc):
        ai = lax.dynamic_index_in_dim(a, i, axis=-1, keepdims=True)
        p = ai * b
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        pad = jnp.zeros(p.shape[:-1] + (1,), dtype=U32)
        contrib = jnp.concatenate([lo, pad], axis=-1) + jnp.concatenate([pad, hi], axis=-1)
        window = lax.dynamic_slice_in_dim(acc, i, Lb + 1, axis=-1)
        return lax.dynamic_update_slice_in_dim(acc, window + contrib, i, axis=-1)

    return lax.fori_loop(0, La, body, out)


@jax.jit
def mul(a, b):
    """Full product, canonical limbs [..., La+Lb]."""
    return carry_canon(mul_cols(a, b))


@jax.jit
def add(a, b):
    """Canonical add -> [..., max(La,Lb)+1] canonical (carry kept)."""
    La, Lb = a.shape[-1], b.shape[-1]
    L = max(La, Lb)
    a = pad_to(a, L + 1)
    b = pad_to(b, L + 1)
    return carry_canon(a + b)


def pad_to(a, L):
    """Zero-pad (or verify) the limb axis to length L."""
    cur = a.shape[-1]
    if cur == L:
        return a
    if cur > L:
        raise ValueError(f"cannot pad {cur} limbs down to {L}")
    pad = jnp.zeros(a.shape[:-1] + (L - cur,), dtype=U32)
    return jnp.concatenate([a, pad], axis=-1)


@jax.jit
def sub(a, b):
    """a - b with borrow.

    Returns (diff [..., L], geq [...] bool) where L = max(La, Lb);
    diff = a - b mod 2^(16L); geq = (a >= b).
    """
    La, Lb = a.shape[-1], b.shape[-1]
    L = max(La, Lb)
    a = pad_to(a, L)
    b = pad_to(b, L)
    cols = a + (jnp.uint32(LIMB_MASK) - b)
    cols = cols.at[..., 0].add(1)
    # a + (2^(16L) - 1 - b) + 1 < 2^(16L+1): one extra column catches the carry
    ext = jnp.concatenate([cols, jnp.zeros(cols.shape[:-1] + (1,), U32)], axis=-1)
    out = carry_canon(ext)
    geq = out[..., L] == 1
    return out[..., :L], geq


@jax.jit
def geq(a, b):
    return sub(a, b)[1]


@jax.jit
def eq(a, b):
    La, Lb = a.shape[-1], b.shape[-1]
    L = max(La, Lb)
    return jnp.all(pad_to(a, L) == pad_to(b, L), axis=-1)


@jax.jit
def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def select(mask, a, b):
    """Elementwise big-int select: mask [...] bool -> where(mask, a, b)."""
    return jnp.where(mask[..., None], a, b)


@jax.jit
def cond_sub(a, n):
    """a - n if a >= n else a (single conditional subtract)."""
    d, ge = sub(a, n)
    return select(ge, d, pad_to(a, d.shape[-1]))


@jax.jit
def mod_add(a, b, n):
    """(a + b) mod n for canonical a, b < n [..., L]."""
    L = n.shape[-1]
    s = add(a, b)                      # [..., L+1]
    d, ge = sub(s, pad_to(n, L + 1))
    return select(ge, d, s)[..., :L]


@jax.jit
def mod_sub(a, b, n):
    """(a - b) mod n for canonical a, b < n [..., L]."""
    L = n.shape[-1]
    d, ge = sub(a, b)
    fix = jnp.where(ge[..., None], jnp.zeros_like(n), n)
    ext = jnp.concatenate([d + fix, jnp.zeros(d.shape[:-1] + (1,), U32)], axis=-1)
    # when borrow occurred, d = a-b+2^(16L); adding n and dropping the top
    # limb yields a-b+n.  Columns < 2^17 so carry_canon bound holds.
    return carry_canon(ext)[..., :L]


@jax.jit
def mod_neg(a, n):
    """(-a) mod n."""
    d, _ = sub(n, a)
    z = is_zero(a)
    return select(z, jnp.zeros_like(d), d)


def get_bit(a, i):
    """Bit i of a (static i) -> uint32 {0,1}."""
    limb, off = divmod(i, LIMB_BITS)
    return (a[..., limb] >> off) & 1


def shift_right_bits(a, k):
    """a >> k for static 0 <= k < 16 (same limb count)."""
    if k == 0:
        return a
    lo = a >> k
    hi_src = jnp.concatenate(
        [a[..., 1:], jnp.zeros(a.shape[:-1] + (1,), U32)], axis=-1
    )
    return (lo | ((hi_src << (LIMB_BITS - k)) & LIMB_MASK)) & LIMB_MASK
