"""Batched Paillier on TPU (device compute path).

Replaces kzen-paillier's GMP modexps (reference call sites:
/root/reference/src/utilities/mta/mod.rs:62-75 encrypt,
 gg_2020/state_machine/sign/rounds.rs:264-280 decrypt,
 party_two.rs:390-424 homomorphic eval) with batch kernels:

  encrypt   c = (1 + m*n) * r^n  mod n^2          (g = n + 1)
  decrypt   CRT: two half-width modexps mod p^2 / q^2 + exact division
  add       c1 * c2 mod n^2
  mul       c^k mod n^2

Every session/party slot carries its *own* modulus; keys are pytrees of
limb arrays with arbitrary leading batch shape.  Key generation (prime
search) is host-side: tpu_mpc/host/paillier.py.

The exact divisions L_p(u) = (u-1)/p are done branch-free by multiplying by
p^{-1} mod 2^1024 (precomputed on host) and truncating — exact because p
divides u-1.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core import bigint as bi
from ..core.bigint import U32
from ..core.limbs import batch_to_limbs, nlimbs
from ..core.montgomery import MontCtx, mont_exp, mont_mul, to_mont, mod_mul

L_N = nlimbs(2048)    # modulus n
L_NN = nlimbs(4096)   # n^2
L_P = nlimbs(1024)    # prime factors
L_PP = nlimbs(2048)   # p^2


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, f) for f in fields), None

    def unflatten(aux, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
class BatchEncryptionKey:
    """Public keys for a batch: n [..., 128] plus Montgomery ctxs for n, n^2."""

    n: Any
    n_ctx: MontCtx
    nn_ctx: MontCtx

    @classmethod
    def from_ints(cls, ns, bits: int = 2048) -> "BatchEncryptionKey":
        ns_arr = np.asarray(ns, dtype=object)
        n = jnp.asarray(batch_to_limbs(ns_arr, nlimbs(bits)))
        n_ctx = MontCtx.from_ints(ns_arr, bits)
        nn_ctx = MontCtx.from_ints(ns_arr * ns_arr, 2 * bits)
        return cls(n, n_ctx, nn_ctx)


@_pytree_dataclass
class BatchDecryptionKey:
    """Secret keys for a batch (CRT form).

    p, q:        [..., 64]   prime factors
    pp/qq_ctx:   Montgomery ctxs for p^2, q^2
    pm1, qm1:    [..., 64]   p-1, q-1 (the CRT exponents)
    hp, hq:      [..., 64]   (L_p((1+n)^{p-1} mod p^2))^{-1} mod p, resp. q
    p_inv_2k:    [..., 64]   p^{-1} mod 2^1024 (for exact division)
    q_inv_2k:    [..., 64]
    p_ctx,q_ctx: Montgomery ctxs for p, q (for the final mulmods)
    pinv_mod_q:  [..., 64]   p^{-1} mod q (CRT recombination)
    """

    p: Any
    q: Any
    pp_ctx: MontCtx
    qq_ctx: MontCtx
    pm1: Any
    qm1: Any
    hp: Any
    hq: Any
    p_inv_2k: Any
    q_inv_2k: Any
    p_ctx: MontCtx
    q_ctx: MontCtx
    pinv_mod_q: Any

    @classmethod
    def from_ints(cls, ps, qs, bits: int = 2048) -> "BatchDecryptionKey":
        half = bits // 2
        L_half = nlimbs(half)
        ps = np.asarray(ps, dtype=object)
        qs = np.asarray(qs, dtype=object)
        two_k = 1 << (16 * L_half)

        def per(fn):
            flat = [fn(int(p), int(q)) for p, q in zip(ps.reshape(-1), qs.reshape(-1))]
            return np.asarray(flat, dtype=object).reshape(ps.shape)

        def hp_of(p, q):
            n = p * q
            u = pow(1 + n, p - 1, p * p)
            return pow((u - 1) // p, -1, p)

        def hq_of(p, q):
            n = p * q
            u = pow(1 + n, q - 1, q * q)
            return pow((u - 1) // q, -1, q)

        arr = lambda v, L: jnp.asarray(batch_to_limbs(v, L))
        return cls(
            p=arr(ps, L_half),
            q=arr(qs, L_half),
            pp_ctx=MontCtx.from_ints(ps * ps, bits),
            qq_ctx=MontCtx.from_ints(qs * qs, bits),
            pm1=arr(per(lambda p, q: p - 1), L_half),
            qm1=arr(per(lambda p, q: q - 1), L_half),
            hp=arr(per(hp_of), L_half),
            hq=arr(per(hq_of), L_half),
            p_inv_2k=arr(per(lambda p, q: pow(p, -1, two_k)), L_half),
            q_inv_2k=arr(per(lambda p, q: pow(q, -1, two_k)), L_half),
            p_ctx=MontCtx.from_ints(ps, half),
            q_ctx=MontCtx.from_ints(qs, half),
            pinv_mod_q=arr(per(lambda p, q: pow(p, -1, q)), L_half),
        )


@jax.jit
def encrypt(ek: BatchEncryptionKey, m, r):
    """E(m; r) = (1 + m n) r^n mod n^2.   m [..., 128] < n, r [..., 128] < n."""
    L = ek.n.shape[-1]
    mn = bi.mul(m, ek.n)                                    # [..., 2L], < n^2
    one = jnp.zeros_like(mn).at[..., 0].set(1)
    gm = bi.mod_add(mn, one, ek.nn_ctx.n)                   # 1 + m n  (< n^2)
    rn = mont_exp(bi.pad_to(r, 2 * L), ek.n, ek.nn_ctx, ebits=16 * L)
    return mod_mul(gm, rn, ek.nn_ctx)


def _exact_div(u_minus_1, inv_2k, out_limbs):
    """(u-1)/d given d | (u-1): multiply by d^{-1} mod 2^(16*out_limbs)."""
    prod = bi.mul(u_minus_1[..., : 2 * out_limbs], bi.pad_to(inv_2k, out_limbs))
    return prod[..., :out_limbs]


@jax.jit
def decrypt(dk: BatchDecryptionKey, c):
    """CRT Paillier decryption of c [..., 256] -> m [..., 128].

    mp = L_p(c^{p-1} mod p^2) hp mod p;  mq likewise;
    m  = mp + p * ((mq - mp) pinv mod q).
    """
    c_mod_pp = _mod_by(c, dk.pp_ctx)
    c_mod_qq = _mod_by(c, dk.qq_ctx)
    Lh = dk.p.shape[-1]
    up = mont_exp(c_mod_pp, dk.pm1, dk.pp_ctx, ebits=16 * Lh)
    uq = mont_exp(c_mod_qq, dk.qm1, dk.qq_ctx, ebits=16 * Lh)
    one = jnp.zeros_like(up).at[..., 0].set(1)
    lp = _exact_div(bi.sub(up, one)[0], dk.p_inv_2k, Lh)
    lq = _exact_div(bi.sub(uq, one)[0], dk.q_inv_2k, Lh)
    mp = mod_mul(_mod_by_small(lp, dk.p_ctx), dk.hp, dk.p_ctx)
    mq = mod_mul(_mod_by_small(lq, dk.q_ctx), dk.hq, dk.q_ctx)
    # mp < p may exceed q when p > q; one conditional subtract reduces it
    # mod q (mp < p < 2q since both primes have the top bit set) before the
    # CRT difference — otherwise (mq - mp) mod q wraps wrong when mp > mq+q.
    mp_red = _mod_by_small(mp, dk.q_ctx)
    d = bi.mod_sub(mq, mp_red, dk.q_ctx.n)
    t = mod_mul(d, dk.pinv_mod_q, dk.q_ctx)
    # m = mp + p t <= (p-1) + p(q-1) = pq - 1: a plain add, no reduction
    pt = bi.mul(dk.p, t)                                    # [..., 2 Lh]
    return bi.add(pt, bi.pad_to(mp, 2 * Lh))[..., : 2 * Lh]


def _mod_by(c, ctx: MontCtx):
    """c mod n for c of twice the limb width of n.

    c = hi * R + lo with R = 2^(16L):
      hi * R mod n = mont_mul(hi, R^2)   (Montgomery divides by R)
      lo mod n     = mont_mul(lo, rone)  (rone = R mod n, same trick)
    """
    L = ctx.L
    lo = c[..., :L]
    hi = c[..., L : 2 * L]
    hiR = mont_mul(hi, ctx.r2, ctx)
    lo_red = mont_mul(lo, ctx.rone, ctx)
    return bi.mod_add(hiR, lo_red, ctx.n)


def _mod_by_small(x, ctx: MontCtx):
    """x [..., L] mod n where x < 2n (our factors have the top bit set)."""
    return bi.cond_sub(x, ctx.n)[..., : ctx.L]


@jax.jit
def ciphertext_add(ek: BatchEncryptionKey, c1, c2):
    """E(m1) (+) E(m2) = c1 c2 mod n^2."""
    return mod_mul(c1, c2, ek.nn_ctx)


@jax.jit
def ciphertext_add_plain(ek: BatchEncryptionKey, c, m):
    """E(m1) (+) m = c * (1 + m n) mod n^2."""
    mn = bi.mul(m, ek.n)
    one = jnp.zeros_like(mn).at[..., 0].set(1)
    return mod_mul(c, bi.mod_add(mn, one, ek.nn_ctx.n), ek.nn_ctx)


@functools.partial(jax.jit, static_argnames=("ebits",))
def ciphertext_mul_plain(ek: BatchEncryptionKey, c, k, ebits: int = 256):
    """E(m) (*) k = c^k mod n^2   (k < 2^ebits)."""
    return mont_exp(c, k, ek.nn_ctx, ebits=ebits)
