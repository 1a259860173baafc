"""Batched Montgomery multiplication and fixed-window modular exponentiation.

The workhorse of the whole framework: Paillier encrypt/decrypt, the zk-Paillier
proofs (correct-key, range proofs, PDL) and ring-Pedersen commitments are all
modexps over 2048- or 4096-bit moduli.  In the reference these are single GMP
`mod_pow` calls (e.g. /root/reference/src/utilities/mta/range_proofs.rs:48-57);
here a single call runs a whole batch of sessions, each with its *own*
modulus, as one constant-shape kernel.

Algorithm: CIOS (coarsely integrated operand scanning) Montgomery multiply on
16-bit limbs, with lazy-carry columns.  Each of the L steps does O(L)
vectorized uint32 work over the batch; the L-step loop is a lax.fori_loop so
trace size stays O(L), and all slicing is static-shape (the running value is
shifted down one limb per step instead of indexing upward).

Exponentiation: fixed 4-bit windows, branch-free table select via masked sum
(constant-time by construction — no secret-dependent control flow).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .limbs import LIMB_BITS, LIMB_MASK, batch_to_limbs, nlimbs
from .bigint import U32, carry_canon, cond_sub, pad_to, select, sub

WINDOW = 4  # window width for modexp; 4 never straddles a 16-bit limb


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MontCtx:
    """Montgomery context for a (batch of) odd moduli.

    n:      [..., L]  modulus limbs
    n0inv:  [..., 1]  -n^{-1} mod 2^16
    r2:     [..., L]  R^2 mod n, R = 2^(16 L)
    rone:   [..., L]  R mod n (Montgomery form of 1)
    """

    n: Any
    n0inv: Any
    r2: Any
    rone: Any

    @property
    def L(self) -> int:
        return self.n.shape[-1]

    def tree_flatten(self):
        return (self.n, self.n0inv, self.r2, self.rone), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_ints(cls, moduli, bits: int) -> "MontCtx":
        """Host-side construction from python ints (scalar or nested list)."""
        L = nlimbs(bits)
        scalar = isinstance(moduli, int)
        ms = [moduli] if scalar else list(np.asarray(moduli, dtype=object).reshape(-1))
        R = 1 << (LIMB_BITS * L)
        n0, r2, rone = [], [], []
        for m in ms:
            m = int(m)
            if m % 2 == 0:
                raise ValueError("Montgomery requires odd modulus")
            n0.append((-pow(m, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))
            r2.append((R * R) % m)
            rone.append(R % m)
        shape = () if scalar else np.asarray(moduli, dtype=object).shape
        n_arr = batch_to_limbs(np.reshape(np.asarray(ms, object), shape) if shape else ms[0], L)
        r2_arr = batch_to_limbs(np.reshape(np.asarray(r2, object), shape) if shape else r2[0], L)
        rone_arr = batch_to_limbs(np.reshape(np.asarray(rone, object), shape) if shape else rone[0], L)
        n0_arr = np.asarray(n0, dtype=np.uint32).reshape(shape + (1,))
        return cls(jnp.asarray(n_arr), jnp.asarray(n0_arr), jnp.asarray(r2_arr), jnp.asarray(rone_arr))


@jax.jit
def mont_mul(a, b, ctx: MontCtx):
    """Montgomery product a*b*R^{-1} mod n.  a, b canonical < n, [..., L]."""
    L = ctx.L
    n = ctx.n
    n0inv = ctx.n0inv  # [..., 1]
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1], n.shape[:-1])
    # c holds L+2 lazy columns of the running (shifted) accumulator
    c0 = jnp.zeros(batch + (L + 2,), dtype=U32)
    a = jnp.broadcast_to(a, batch + (L,))
    zpad2 = jnp.zeros(batch + (2,), dtype=U32)
    zpad1 = jnp.zeros(batch + (1,), dtype=U32)

    def body(i, c):
        ai = lax.dynamic_index_in_dim(a, i, axis=-1, keepdims=True)   # [..., 1]
        p = ai * b                                                    # [..., L] exact
        c = c + jnp.concatenate([p & LIMB_MASK, zpad2], axis=-1)
        c = c + jnp.concatenate([zpad1, p >> LIMB_BITS, zpad1], axis=-1)
        m = (c[..., 0:1] * n0inv) & LIMB_MASK                         # [..., 1]
        q = m * n
        c = c + jnp.concatenate([q & LIMB_MASK, zpad2], axis=-1)
        c = c + jnp.concatenate([zpad1, q >> LIMB_BITS, zpad1], axis=-1)
        carry = c[..., 0:1] >> LIMB_BITS                              # c0 = 0 mod 2^16
        c = jnp.concatenate([c[..., 1:], zpad1], axis=-1)             # shift down one limb
        return c.at[..., 0:1].add(carry)

    c = lax.fori_loop(0, L, body, c0)
    # value now < 2n, held in columns c[0..L+1] each < 2^27
    res = carry_canon(c)
    return cond_sub(res, pad_to(n, L + 2))[..., :L]


@jax.jit
def to_mont(a, ctx: MontCtx):
    return mont_mul(a, ctx.r2, ctx)


@jax.jit
def from_mont(am, ctx: MontCtx):
    one = jnp.zeros_like(am).at[..., 0].set(1)
    return mont_mul(am, one, ctx)


@jax.jit
def mod_mul(a, b, ctx: MontCtx):
    """Plain modular product (two Montgomery multiplies)."""
    return mont_mul(to_mont(a, ctx), b, ctx)


def _select_entry(table, digit, nent):
    """Branch-free table select: table [nent, ..., L], digit [...] -> [..., L]."""
    ks = jnp.arange(nent, dtype=U32).reshape((nent,) + (1,) * (table.ndim - 1))
    mask = digit[None, ..., None] == ks
    return jnp.sum(jnp.where(mask, table, jnp.uint32(0)), axis=0)


@functools.partial(jax.jit, static_argnames=("ebits",))
def mont_exp(x, e, ctx: MontCtx, ebits: int):
    """x^e mod n, batched.  x canonical < n [..., L]; e canonical [..., Le]
    with e < 2^ebits (ebits static).  Fixed-window, fixed-iteration."""
    L = ctx.L
    nw = -(-ebits // WINDOW)
    nent = 1 << WINDOW
    xm = to_mont(x, ctx)
    batch = jnp.broadcast_shapes(xm.shape[:-1], ctx.rone.shape[:-1])
    rone = jnp.broadcast_to(ctx.rone, batch + (L,))
    entries = [rone, jnp.broadcast_to(xm, batch + (L,))]
    for _ in range(nent - 2):
        entries.append(mont_mul(entries[-1], xm, ctx))
    table = jnp.stack(entries, axis=0)                    # [16, ..., L]
    e = jnp.broadcast_to(e, batch + (e.shape[-1],))

    def body(j, acc):
        wj = nw - 1 - j
        bitpos = wj * WINDOW
        limb = bitpos // LIMB_BITS
        off = bitpos % LIMB_BITS
        elimb = lax.dynamic_index_in_dim(e, limb, axis=-1, keepdims=False)
        digit = (elimb >> off) & (nent - 1)
        for _ in range(WINDOW):
            acc = mont_mul(acc, acc, ctx)
        return mont_mul(acc, _select_entry(table, digit, nent), ctx)

    acc = lax.fori_loop(0, nw, body, rone)
    return from_mont(acc, ctx)


@functools.partial(jax.jit, static_argnames=("ebits_list",))
def mont_exp_prod(xs, es, ctx: MontCtx, ebits_list: tuple, ms: tuple = ()):
    """prod_i xs[i]^es[i] * prod_j ms[j] mod n with shared squarings.

    The ring-Pedersen pattern h1^a * h2^b (mod N~) dominates the MtA range
    proofs (reference: src/utilities/mta/range_proofs.rs:58-67,145-156); a
    k-way product shares one squaring chain across all k exponents, cutting
    the montmul count per window from k*(WINDOW+1) to WINDOW+k.

    xs: tuple of [..., L] bases (canonical < n); es: tuple of [..., Le_i]
    exponents with es[i] < 2^ebits_list[i] (static).  Exponents of different
    widths are staged MSB-first: a fori_loop per distinct width, so short
    exponents cost no table muls in the high windows.

    ms: optional plain (exponent-1) factors folded into the same launch for
    2 montmuls each — the multiplicative verify rearrangement u * c^e ==
    (s1 N + 1) * s^N (range_proofs.rs:105-156 recomputed-commitment form)
    runs with no host-side modular inverse and no extra launch.
    """
    assert len(xs) == len(es) == len(ebits_list) >= 1
    L = ctx.L
    nent = 1 << WINDOW
    nws = [-(-eb // WINDOW) for eb in ebits_list]
    nw_max = max(nws)
    batch = jnp.broadcast_shapes(
        ctx.rone.shape[:-1], *(x.shape[:-1] for x in xs), *(e.shape[:-1] for e in es),
        *(m.shape[:-1] for m in ms)
    )
    rone = jnp.broadcast_to(ctx.rone, batch + (L,))

    tables = []
    for x in xs:
        xm = to_mont(x, ctx)
        entries = [rone, jnp.broadcast_to(xm, batch + (L,))]
        for _ in range(nent - 2):
            entries.append(mont_mul(entries[-1], xm, ctx))
        tables.append(jnp.stack(entries, axis=0))
    es = [jnp.broadcast_to(e, batch + (e.shape[-1],)) for e in es]

    def digit_of(e, j):
        # window j counts from the MSB of the widest exponent
        bitpos = (nw_max - 1 - j) * WINDOW
        limb = bitpos // LIMB_BITS
        off = bitpos % LIMB_BITS
        elimb = lax.dynamic_index_in_dim(e, limb, axis=-1, keepdims=False)
        return (elimb >> off) & (nent - 1)

    def make_body(active):
        def body(j, acc):
            for _ in range(WINDOW):
                acc = mont_mul(acc, acc, ctx)
            for i in active:
                acc = mont_mul(acc, _select_entry(tables[i], digit_of(es[i], j), nent), ctx)
            return acc

        return body

    starts = sorted({nw_max - nw for nw in nws})
    bounds = starts + [nw_max]
    acc = rone
    for k, lo in enumerate(starts):
        active = [i for i in range(len(xs)) if nw_max - nws[i] <= lo]
        acc = lax.fori_loop(lo, bounds[k + 1], make_body(active), acc)
    for m in ms:
        acc = mont_mul(acc, to_mont(m, ctx), ctx)
    return from_mont(acc, ctx)


@functools.partial(jax.jit, static_argnames=("nw",))
def make_fixed_table(x, ctx: MontCtx, nw: int):
    """Fixed-base window table: T[j, d] = x^(d * 16^j) in Montgomery form.

    Built once per long-lived base (the ring-Pedersen h1/h2 of each party,
    reference src/utilities/mta/range_proofs.rs:58-67) and reused across all
    sessions and rounds; mont_exp_fixed_prod then needs ZERO squarings.
    Output: [nw, 16] + batch + [L].
    """
    L = ctx.L
    nent = 1 << WINDOW
    batch = jnp.broadcast_shapes(x.shape[:-1], ctx.rone.shape[:-1])
    rone = jnp.broadcast_to(ctx.rone, batch + (L,))
    xm = jnp.broadcast_to(to_mont(x, ctx), batch + (L,))

    def step(b, _):
        entries = [rone, b]
        for _ in range(nent - 2):
            entries.append(mont_mul(entries[-1], b, ctx))
        nxt = b
        for _ in range(WINDOW):
            nxt = mont_mul(nxt, nxt, ctx)
        return nxt, jnp.stack(entries, axis=0)

    _, table = lax.scan(step, xm, None, length=nw)
    return table


@functools.partial(jax.jit, static_argnames=("ebits_list",))
def mont_exp_fixed_prod(tables, es, ctx: MontCtx, ebits_list: tuple):
    """prod_i base_i^es[i] mod n from precomputed tables — no squarings.

    tables[i]: [nw_i, 16] + batch_i + [L] (batch_i broadcastable against the
    exponent batch); es[i]: [..., Le_i] with es[i] < 2^ebits_list[i].
    Cost: sum_i ceil(ebits_i/4) montmuls total (vs ~1.5-5x that for the
    shared-squaring / independent paths).
    """
    nent = 1 << WINDOW
    nws = [-(-eb // WINDOW) for eb in ebits_list]
    batch = jnp.broadcast_shapes(
        ctx.rone.shape[:-1], *(e.shape[:-1] for e in es)
    )
    acc = jnp.broadcast_to(ctx.rone, batch + (ctx.L,))
    for i, (table, e, nw) in enumerate(zip(tables, es, nws)):
        assert table.shape[0] >= nw, f"table {i} too short: {table.shape[0]} < {nw}"

        def body(j, acc, table=table, e=e):
            limb = (j * WINDOW) // LIMB_BITS
            off = (j * WINDOW) % LIMB_BITS
            elimb = lax.dynamic_index_in_dim(e, limb, axis=-1, keepdims=False)
            digit = (elimb >> off) & (nent - 1)
            entry = lax.dynamic_index_in_dim(table, j, axis=0, keepdims=False)
            return mont_mul(acc, _select_entry(entry, digit, nent), ctx)

        acc = lax.fori_loop(0, nw, body, acc)
    return from_mont(acc, ctx)


def mont_exp_const(x, e_int: int, ctx: MontCtx, ebits: int | None = None):
    """x^e for a host-known (shared) exponent e_int."""
    if ebits is None:
        ebits = max(e_int.bit_length(), 1)
    Le = nlimbs(ebits)
    e = jnp.asarray(batch_to_limbs(e_int, Le))
    return mont_exp(x, e, ctx, ebits)


def mod_inv_prime(a, ctx: MontCtx, p_int: int):
    """a^{-1} mod p for prime p (Fermat), shared host-known modulus."""
    return mont_exp_const(a, p_int - 2, ctx)
