"""RNS (residue number system) Montgomery modexp — the MXU path.

The CIOS kernel in montgomery.py is VPU-bound: each montmul is an O(L^2)
carry-chained limb scan (L sequential fori steps).  In RNS, a big integer is
its residues modulo K independent 16-bit primes, so a full multiply is ONE
elementwise [.., K] vector op; the only super-linear work is Montgomery base
extension, which is a CRT sum

    x mod p' = sum_k xi_k * (M/p_k mod p')  -  alpha * (M mod p')

i.e. a [B, K] x [K, K'] MATMUL with a constant matrix — exactly the shape
the MXU exists for.  This replaces GMP's role for the hot 2048/4096-bit
modexps (reference: every mod_pow in utilities/mta/range_proofs.rs,
zk_pdl_with_slack/mod.rs, kzen-paillier) with an accelerator-native
algorithm rather than a limb-serial translation.

Scheme: Bajard-Imbert RNS Montgomery — approximate first base extension
(q_hat = q + alpha*MA, harmless), exact Shenoy-Kumaresan second extension
via a redundant 2^16 channel:

    montmul(x, y) = x*y*MA^{-1} (mod N), values carried in bases
    A (K primes), B (K+1 primes) and channel r (2^16).

Invariant: inputs/outputs < lam*N with lam = 2(K+2); requires
MA > 4(K+2)*N and MB > lam*N (two extra 16-bit primes of margin each).
The exponentiation is fixed-window (4-bit), fixed-iteration, branch-free —
the same constant-time-by-construction shape as mont_exp.

Exactness of the extension matmuls: 16-bit operands are split into 8-bit
chunks and accumulated per chunk pair; each partial sum is <= K*255^2 < 2^26
(s32-exact), and chunk partials are recombined mod p in u32.  The chunk dot
runs on the MXU as s8 x s8 -> s32 (native on v5e+) or f32 (exact to 2^24;
K split in halves), selectable via TPU_MPC_RNS_DOT={s8,f32}.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .limbs import LIMB_BITS, batch_to_limbs, nlimbs

U32 = jnp.uint32
WINDOW = 4
P_R = 1 << 16  # redundant Shenoy-Kumaresan channel modulus

# f32 default: measured on TPU v5e (r3 modexp matrix) — 1953 vs 1773
# modexp/s at 2048-bit B=1024; tied with s8 at 4096-bit
DOT_IMPL = os.environ.get("TPU_MPC_RNS_DOT", "f32")


# --------------------------------------------------------------------------
# host-side parameter machinery
# --------------------------------------------------------------------------

def _is_prime(m: int) -> bool:
    """Deterministic Miller-Rabin (exact below 3.3e24 with this base set)."""
    if m < 2 or m % 2 == 0:
        return m == 2
    d, s = m - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, m)
        if x in (1, m - 1):
            continue
        for _ in range(s - 1):
            x = x * x % m
            if x == m - 1:
                break
        else:
            return False
    return True


@functools.lru_cache(maxsize=None)
def _primes_16bit(count: int) -> tuple:
    """`count` largest primes below 2^16, descending — keeps 2^16 mod p
    small (< 2^13 for any count we use) so channel reduction folds fast."""
    out = []
    n = (1 << 16) - 1
    while len(out) < count and n > (1 << 15):
        if _is_prime(n):
            out.append(n)
        n -= 2
    if len(out) < count:
        raise ValueError("16-bit prime supply exhausted")
    return tuple(out)


@functools.lru_cache(maxsize=None)
class RnsParams:
    """Modulus-independent RNS bases + extension matrices for one operand
    width.  Cached per nbits."""

    def __init__(self, nbits: int):
        K = nlimbs(nbits) + 2   # MA > 4(K+2) * 2^nbits
        Kp = K + 1              # MB > MA
        ps = _primes_16bit(K + Kp)
        self.nbits, self.K, self.Kp = nbits, K, Kp
        self.pA, self.pB = ps[:K], ps[K:]
        self.MA = functools.reduce(lambda a, b: a * b, self.pA, 1)
        self.MB = functools.reduce(lambda a, b: a * b, self.pB, 1)
        lam = 2 * (K + 2)
        assert self.MA > 4 * (K + 2) << nbits, "MA margin too small"
        assert self.MB > lam << nbits, "MB margin too small"
        self.lam = lam

        pA = np.asarray(self.pA, dtype=np.uint32)
        pB = np.asarray(self.pB, dtype=np.uint32)
        self.pA_arr, self.pB_arr = pA, pB
        self.rA = (65536 % pA.astype(np.uint64)).astype(np.uint32)
        self.rB = (65536 % pB.astype(np.uint64)).astype(np.uint32)
        assert int(self.rA.max()) < (1 << 13) and int(self.rB.max()) < (1 << 13)

        MAk = [self.MA // p for p in self.pA]
        MBj = [self.MB // p for p in self.pB]
        self.invMAk = np.asarray(
            [pow(m % p, -1, p) for m, p in zip(MAk, self.pA)], dtype=np.uint32
        )
        self.invMBj = np.asarray(
            [pow(m % p, -1, p) for m, p in zip(MBj, self.pB)], dtype=np.uint32
        )
        # extension matrices; last column is the redundant 2^16 channel
        self.W1 = np.asarray(
            [[m % p for p in self.pB] + [m % P_R] for m in MAk], dtype=np.uint32
        )  # [K, Kp+1]
        self.W2 = np.asarray(
            [[m % p for p in self.pA] + [m % P_R] for m in MBj], dtype=np.uint32
        )  # [Kp, K+1]
        self.MB_A = np.asarray([self.MB % p for p in self.pA], dtype=np.uint32)
        self.invMB_r = np.uint32(pow(self.MB % P_R, -1, P_R))
        self.invMA_B = np.asarray(
            [pow(self.MA % p, -1, p) for p in self.pB], dtype=np.uint32
        )
        self.invMA_r = np.uint32(pow(self.MA % P_R, -1, P_R))
        # binary reconstruction: full-width limbs of MA/p_k  [K, Lout]
        self.Lout = K + 1  # sum_k xi_k*(MA/p_k) < K*MA < 2^(16(K+1))
        self.Wbin = np.zeros((K, self.Lout), dtype=np.uint32)
        for k, m in enumerate(MAk):
            self.Wbin[k] = batch_to_limbs(m, self.Lout)
        # binary -> residue conversion matrices: W16[l, k] = 2^(16 l) mod p_k.
        # Lets to_residues run ON DEVICE as one chunked dot (MXU) instead of
        # a ~(K+Kp) bigint-mod host loop per element (the O(S) wall at
        # S >= 1024; see _to_residues_kernel).
        L = nlimbs(nbits)
        self.Lin = L
        W16A = np.zeros((L, K), dtype=np.uint32)
        W16B = np.zeros((L, Kp), dtype=np.uint32)
        rowA = np.ones(K, dtype=np.uint64)
        rowB = np.ones(Kp, dtype=np.uint64)
        pA64, pB64 = pA.astype(np.uint64), pB.astype(np.uint64)
        for l in range(L):
            W16A[l] = rowA.astype(np.uint32)
            W16B[l] = rowB.astype(np.uint32)
            rowA = (rowA << 16) % pA64
            rowB = (rowB << 16) % pB64
        self.W16A, self.W16B = W16A, W16B

    def dev_consts(self):
        """Device copies of the binary->residue constants (uploaded once)."""
        if not hasattr(self, "_dev"):
            self._dev = tuple(
                jnp.asarray(a)
                for a in (self.W16A, self.W16B, self.pA_arr, self.pB_arr,
                          self.rA, self.rB)
            )
        return self._dev

    def to_residues(self, xs) -> tuple:
        """object ndarray -> (A [..,K], B [..,Kp], r [..]) u32 host arrays."""
        xs = np.asarray(xs, dtype=object)
        flat = xs.reshape(-1)
        A = np.empty((flat.shape[0], self.K), dtype=np.uint32)
        B = np.empty((flat.shape[0], self.Kp), dtype=np.uint32)
        r = np.empty((flat.shape[0],), dtype=np.uint32)
        for i, v in enumerate(flat.tolist()):
            v = int(v)
            A[i] = [v % p for p in self.pA]
            B[i] = [v % p for p in self.pB]
            r[i] = v % P_R
        sh = xs.shape
        return A.reshape(sh + (self.K,)), B.reshape(sh + (self.Kp,)), r.reshape(sh)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RnsCtx:
    """Per-modulus-batch device constants (batch dims lead, channel last)."""

    params_nbits: int
    negNinvA: Any   # [.., K]   (-N)^{-1} mod pA_k
    N_B: Any        # [.., Kp]  N mod pB_j
    N_r: Any        # [..]      N mod 2^16
    monA: Any       # residues of MA mod N (Montgomery 1 / accumulator seed)
    monB: Any
    mon_r: Any
    r2A: Any        # residues of MA^2 mod N (to_mont multiplier)
    r2B: Any
    r2_r: Any

    def tree_flatten(self):
        return (
            (self.negNinvA, self.N_B, self.N_r, self.monA, self.monB,
             self.mon_r, self.r2A, self.r2B, self.r2_r),
            self.params_nbits,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, *children)

    def map_batch(self, fn) -> "RnsCtx":
        """Apply a batch-axis transform (take/tile/expand) to every constant
        array.  All arrays carry the modulus-batch dims leading (channel dim,
        when present, is last), so any transform addressed at a batch axis
        applies uniformly — this lets derived ModCtx views reuse the parent's
        RNS constants instead of re-deriving them host-side per pass."""
        return RnsCtx(
            self.params_nbits,
            *(fn(a) for a in (
                self.negNinvA, self.N_B, self.N_r, self.monA, self.monB,
                self.mon_r, self.r2A, self.r2B, self.r2_r,
            )),
        )

    @classmethod
    def from_ints(cls, ns, nbits: int) -> "RnsCtx":
        par = RnsParams(nbits)
        ns = np.asarray(ns, dtype=object)
        flat = ns.reshape(-1)
        negNinvA = np.empty((flat.shape[0], par.K), dtype=np.uint32)
        N_B = np.empty((flat.shape[0], par.Kp), dtype=np.uint32)
        N_r = np.empty((flat.shape[0],), dtype=np.uint32)
        mon = np.empty(flat.shape[0], dtype=object)
        r2 = np.empty(flat.shape[0], dtype=object)
        for i, nv in enumerate(flat.tolist()):
            nv = int(nv)
            negNinvA[i] = [(-pow(nv, -1, p)) % p for p in par.pA]
            N_B[i] = [nv % p for p in par.pB]
            N_r[i] = nv % P_R
            mon[i] = par.MA % nv
            r2[i] = (par.MA * par.MA) % nv
        sh = ns.shape
        monA, monB, mon_r = par.to_residues(mon.reshape(sh))
        r2A, r2B, r2_r = par.to_residues(r2.reshape(sh))
        j = jnp.asarray
        return cls(
            params_nbits=nbits,
            negNinvA=j(negNinvA.reshape(sh + (par.K,))),
            N_B=j(N_B.reshape(sh + (par.Kp,))),
            N_r=j(N_r.reshape(sh)),
            monA=j(monA), monB=j(monB), mon_r=j(mon_r),
            r2A=j(r2A), r2B=j(r2B), r2_r=j(r2_r),
        )


# --------------------------------------------------------------------------
# device kernels
# --------------------------------------------------------------------------

def _fold_mod(t, p, r16):
    """u32 t (< 2^32) mod 16-bit p, given r16 = 2^16 mod p (< 2^13).
    Six high-half folds bring t under ~2^16.2, then two cond-subtracts."""
    for _ in range(6):
        t = (t >> 16) * r16 + (t & 0xFFFF)
    t = jnp.where(t >= p, t - p, t)
    t = jnp.where(t >= p, t - p, t)
    return t


def _mulmod_ch(a, b, p, r16):
    """(a*b) mod p for 16-bit channel values (product exact in u32)."""
    return _fold_mod(a * b, p, r16)


def _ext_dot(xi, W):
    """Exact integer sum_k xi[.., k] * W[k, j], chunked: returns s32 partial
    planes P[c1][c2] (weights 2^(8(c1+c2))), each 0 <= P < 2^26.

    xi: [.., K] u32 16-bit values; W: [K, J] u32 16-bit constant matrix."""
    K = xi.shape[-1]
    nd = xi.ndim
    dimnums = (((nd - 1,), (0,)), ((), ()))
    if DOT_IMPL == "s8":
        # zero-point trick: u8 v -> s8 (v-128); correct with row/col sums
        xc = [(xi & 0xFF).astype(jnp.int32) - 128, (xi >> 8).astype(jnp.int32) - 128]
        wc = [(W & 0xFF).astype(jnp.int32) - 128, (W >> 8).astype(jnp.int32) - 128]
        x8 = [c.astype(jnp.int8) for c in xc]
        w8 = [c.astype(jnp.int8) for c in wc]
        xsum = [jnp.sum(c, axis=-1, keepdims=True) for c in xc]          # [..,1]
        wsum = [jnp.sum(c, axis=0, keepdims=True) for c in wc]           # [1,J]
        out = []
        for c1 in range(2):
            row = []
            for c2 in range(2):
                s = lax.dot_general(
                    x8[c1], w8[c2], dimnums, preferred_element_type=jnp.int32
                )
                row.append(s + 128 * xsum[c1] + 128 * wsum[c2] + K * 16384)
            out.append(row)
        return out
    # f32 path: products <= 255^2, sum over K*255^2 must stay < 2^24 -> split K
    halves = 1 if K * 255 * 255 < (1 << 24) else 2
    xc = [(xi & 0xFF).astype(jnp.float32), (xi >> 8).astype(jnp.float32)]
    wc = [(W & 0xFF).astype(jnp.float32), (W >> 8).astype(jnp.float32)]
    step = -(-K // halves)
    out = []
    for c1 in range(2):
        row = []
        for c2 in range(2):
            acc = None
            for h in range(halves):
                sl = slice(h * step, min((h + 1) * step, K))
                s = lax.dot_general(
                    xc[c1][..., sl], wc[c2][sl], dimnums,
                    preferred_element_type=jnp.float32,
                ).astype(jnp.int32)
                acc = s if acc is None else acc + s
            row.append(acc)
        out.append(row)
    return out


@jax.jit
def _to_residues_kernel(x_limbs, W16A, W16B, pA, pB, rA, rB):
    """Binary 16-bit limbs [.., L] -> RNS residues on device: one chunked
    dot per base (A [.., K], B [.., Kp]) + the redundant 2^16 channel.
    Replaces the per-element (K+Kp)-bigint-mod host loop of to_residues —
    the conversion rides the MXU with the same planes machinery as the
    base extensions."""
    A = _ext_combine(_ext_dot(x_limbs, W16A), pA, rA)
    B = _ext_combine(_ext_dot(x_limbs, W16B), pB, rB)
    r = x_limbs[..., 0] & 0xFFFF
    return A, B, r


def _planes(parts, sel):
    return [[sel(parts[c1][c2]) for c2 in range(2)] for c1 in range(2)]


def _ext_combine(parts, p, r16):
    """Partial planes -> sum mod p (u32).  p, r16: [J]-broadcastable."""
    out = None
    for c1 in range(2):
        for c2 in range(2):
            sm = _fold_mod(parts[c1][c2].astype(U32), p, r16)  # < p
            sh = c1 + c2
            if sh == 1:
                sm = _fold_mod(sm * jnp.uint32(256), p, r16)
            elif sh == 2:
                sm = _mulmod_ch(sm, jnp.broadcast_to(r16, sm.shape), p, r16)
            out = sm if out is None else out + sm
    return _fold_mod(out, p, r16)  # out < 4p < 2^18


def _ext_mod_2_16(parts):
    """Partial planes -> sum mod 2^16 (for the redundant channel)."""
    s = parts[0][0].astype(U32)
    s = s + ((parts[0][1].astype(U32) + parts[1][0].astype(U32)) << 8)
    s = s + (parts[1][1].astype(U32) << 16)
    return s & 0xFFFF


@dataclasses.dataclass
class _Consts:
    pA: Any
    pB: Any
    rA: Any
    rB: Any
    invMAk: Any
    invMBj: Any
    W1: Any
    W2: Any
    MB_A: Any
    invMB_r: Any
    invMA_B: Any
    invMA_r: Any
    Wbin: Any


def _consts(par: RnsParams) -> _Consts:
    j = jnp.asarray
    return _Consts(
        pA=j(par.pA_arr), pB=j(par.pB_arr), rA=j(par.rA), rB=j(par.rB),
        invMAk=j(par.invMAk), invMBj=j(par.invMBj),
        W1=j(par.W1), W2=j(par.W2), MB_A=j(par.MB_A),
        invMB_r=j(np.uint32(par.invMB_r)),
        invMA_B=j(par.invMA_B), invMA_r=j(np.uint32(par.invMA_r)),
        Wbin=j(par.Wbin),
    )


def rns_montmul(x, y, ctx: RnsCtx, cs: _Consts):
    """x*y*MA^{-1} mod N (result < lam*N).  x, y: (A, B, r) residue arrays."""
    xA, xB, xr = x
    yA, yB, yr = y
    pA, pB, rA, rB = cs.pA, cs.pB, cs.rA, cs.rB

    sA = _mulmod_ch(xA, yA, pA, rA)
    sB = _mulmod_ch(xB, yB, pB, rB)
    sr = (xr * yr) & 0xFFFF

    # q = -s * N^{-1} mod MA (per-channel)
    qA = _mulmod_ch(sA, ctx.negNinvA, pA, rA)
    # approximate extension: q_hat = sum_k xi_k*(MA/p_k) = q + alpha*MA
    xi = _mulmod_ch(qA, cs.invMAk, pA, rA)
    parts = _ext_dot(xi, cs.W1)
    qhB = _ext_combine(_planes(parts, lambda a: a[..., :-1]), pB, rB)
    qh_r = _ext_mod_2_16(_planes(parts, lambda a: a[..., -1]))

    # t = (s + q_hat*N) / MA  in base B and channel r
    num = sB + _mulmod_ch(qhB, ctx.N_B, pB, rB)           # < 2p: reduce
    num = jnp.where(num >= pB, num - pB, num)             # before the mul
    tB = _mulmod_ch(num, cs.invMA_B, pB, rB)
    t_r = (((sr + qh_r * ctx.N_r) & 0xFFFF) * cs.invMA_r) & 0xFFFF

    # exact extension B -> A (Shenoy-Kumaresan via channel r)
    xi2 = _mulmod_ch(tB, cs.invMBj, pB, rB)
    parts2 = _ext_dot(xi2, cs.W2)
    sum_r = _ext_mod_2_16(_planes(parts2, lambda a: a[..., -1]))
    alpha = (((sum_r - t_r) & 0xFFFF) * cs.invMB_r) & 0xFFFF   # 0 <= alpha < Kp
    tA_raw = _ext_combine(_planes(parts2, lambda a: a[..., :-1]), pA, rA)
    corr = _mulmod_ch(jnp.broadcast_to(alpha[..., None], tA_raw.shape), cs.MB_A, pA, rA)
    tA = jnp.where(tA_raw >= corr, tA_raw - corr, tA_raw + pA - corr)
    return tA, tB, t_r


def _select_ch(table, digit, nent):
    """Branch-free select from [nent, .., C] (or [nent, ..] for channel r)."""
    ks = jnp.arange(nent, dtype=U32).reshape((nent,) + (1,) * (table.ndim - 1))
    mask = digit.reshape((1,) + digit.shape + (1,) * (table.ndim - 1 - digit.ndim)) == ks
    return jnp.sum(jnp.where(mask, table, jnp.uint32(0)), axis=0)


@functools.partial(jax.jit, static_argnames=("ebits", "nbits", "reduce_axis0"))
def _rns_exp_kernel(xA, xB, xr, e, ctx: RnsCtx, ebits: int, nbits: int,
                    reduce_axis0: bool = False):
    """reduce_axis0: tree-multiply the results over the leading batch axis
    IN-KERNEL (Montgomery domain) before conversion — prod_s x_s^{e_s} with
    only ONE value per trailing slot crossing to the host.  Requires the
    ctx (moduli) batch to be size-1 along axis 0 (shared moduli — the
    cross-session batch-verification precondition)."""
    par = RnsParams(nbits)
    cs = _consts(par)
    nent = 1 << WINDOW
    nw = -(-ebits // WINDOW)
    batch = jnp.broadcast_shapes(xA.shape[:-1], ctx.monA.shape[:-1])

    one = (
        jnp.broadcast_to(ctx.monA, batch + (par.K,)),
        jnp.broadcast_to(ctx.monB, batch + (par.Kp,)),
        jnp.broadcast_to(ctx.mon_r, batch),
    )
    xm = rns_montmul((xA, xB, xr), (ctx.r2A, ctx.r2B, ctx.r2_r), ctx, cs)
    xm = tuple(jnp.broadcast_to(c, o.shape) for c, o in zip(xm, one))
    entries = [one, xm]
    for _ in range(nent - 2):
        entries.append(rns_montmul(entries[-1], xm, ctx, cs))
    tabA = jnp.stack([t[0] for t in entries])
    tabB = jnp.stack([t[1] for t in entries])
    tabr = jnp.stack([t[2] for t in entries])
    e = jnp.broadcast_to(e, batch + (e.shape[-1],))

    def body(j, acc):
        wj = nw - 1 - j
        bitpos = wj * WINDOW
        limb = bitpos // LIMB_BITS
        off = bitpos % LIMB_BITS
        elimb = lax.dynamic_index_in_dim(e, limb, axis=-1, keepdims=False)
        digit = (elimb >> off) & (nent - 1)
        for _ in range(WINDOW):
            acc = rns_montmul(acc, acc, ctx, cs)
        ent = (
            _select_ch(tabA, digit, nent),
            _select_ch(tabB, digit, nent),
            _select_ch(tabr, digit, nent),
        )
        return rns_montmul(acc, ent, ctx, cs)

    acc = lax.fori_loop(0, nw, body, one)
    if reduce_axis0:
        # log-depth product over axis 0, still in Montgomery form (the
        # domain is closed under rns_montmul)
        while acc[0].shape[0] > 1:
            n = acc[0].shape[0]
            h = n // 2
            pair = rns_montmul(
                tuple(c[:h] for c in acc), tuple(c[n - h:] for c in acc), ctx, cs
            )
            if n % 2:
                pair = tuple(
                    jnp.concatenate([p, c[h:h + 1]], axis=0)
                    for p, c in zip(pair, acc)
                )
            acc = pair
    # from_mont: montmul by integer 1 (residues all-one)
    res = rns_montmul(
        acc,
        (jnp.ones_like(acc[0]), jnp.ones_like(acc[1]), jnp.ones_like(acc[2])),
        ctx, cs,
    )
    # RNS -> binary: v = sum_k xi_k*(MA/p_k) = res + alpha*MA (alpha < K);
    # emit chunk partial planes; host recombines exactly in int64
    xi = _mulmod_ch(res[0], cs.invMAk, cs.pA, cs.rA)
    parts = _ext_dot(xi, cs.Wbin)
    return parts[0][0], parts[0][1], parts[1][0], parts[1][1]


@functools.partial(jax.jit, static_argnames=("nw", "nbits"))
def _rns_make_fixed_table(xA, xB, xr, ctx: RnsCtx, nw: int, nbits: int):
    """Fixed-base window table in RNS-Montgomery form: T[j][d] = x^(d*16^j).

    The RNS analog of montgomery.make_fixed_table — built once per
    long-lived base (ring-Pedersen h1/h2), so every later commitment runs
    squaring-free on the MXU path.  Output: ([nw, 16, .., K], [.., Kp],
    [..]) channel stacks."""
    par = RnsParams(nbits)
    cs = _consts(par)
    nent = 1 << WINDOW
    batch = jnp.broadcast_shapes(xA.shape[:-1], ctx.monA.shape[:-1])
    one = (
        jnp.broadcast_to(ctx.monA, batch + (par.K,)),
        jnp.broadcast_to(ctx.monB, batch + (par.Kp,)),
        jnp.broadcast_to(ctx.mon_r, batch),
    )
    xm = rns_montmul((xA, xB, xr), (ctx.r2A, ctx.r2B, ctx.r2_r), ctx, cs)
    xm = tuple(jnp.broadcast_to(c, o.shape) for c, o in zip(xm, one))

    # phase 1 — the only serial dependency: window bases W[j] = x^(16^j)
    # (4 squarings per window).  Collecting entries inside this scan made
    # the build 19 serial montmuls per window (~11k serial ops, minutes of
    # wall per table at 4096-bit); entries don't need to be serial per
    # window, so phase 2 computes E[d] = E[d-1] * W batched over the whole
    # [nw] window axis: serial depth drops to 4*nw + 14.
    def sq_step(b, _):
        nxt = b
        for _ in range(WINDOW):
            nxt = rns_montmul(nxt, nxt, ctx, cs)
        return nxt, b

    _, W = lax.scan(sq_step, xm, None, length=nw)   # triple of [nw, ..., K]

    one_b = tuple(jnp.broadcast_to(c, w.shape) for c, w in zip(one, W))
    entries = [one_b, W]
    for _ in range(nent - 2):
        entries.append(rns_montmul(entries[-1], W, ctx, cs))
    return tuple(
        jnp.stack([e[c] for e in entries], axis=1) for c in range(3)
    )  # (tA, tB, tr), each [nw, nent, ...]


@functools.partial(jax.jit, static_argnames=("ebits_list", "nbits"))
def _rns_fixed_prod_kernel(tables, es, ctx: RnsCtx, ebits_list: tuple, nbits: int):
    """prod_i base_i^es[i] from RNS fixed tables — ZERO squarings:
    sum_i ceil(ebits_i/4) rns_montmuls total.  Returns the same partial
    planes as _rns_exp_kernel (decode via RnsLazy)."""
    par = RnsParams(nbits)
    cs = _consts(par)
    nent = 1 << WINDOW
    batch = jnp.broadcast_shapes(
        ctx.monA.shape[:-1], *(e.shape[:-1] for e in es)
    )
    acc = (
        jnp.broadcast_to(ctx.monA, batch + (par.K,)),
        jnp.broadcast_to(ctx.monB, batch + (par.Kp,)),
        jnp.broadcast_to(ctx.mon_r, batch),
    )
    for (tA, tB, tr), e, eb in zip(tables, es, ebits_list):
        nw = -(-eb // WINDOW)
        e = jnp.broadcast_to(e, batch + (e.shape[-1],))

        def body(j, acc, tA=tA, tB=tB, tr=tr, e=e):
            bitpos = j * WINDOW
            limb = bitpos // LIMB_BITS
            off = bitpos % LIMB_BITS
            elimb = lax.dynamic_index_in_dim(e, limb, axis=-1, keepdims=False)
            digit = (elimb >> off) & (nent - 1)
            ent = (
                _select_ch(lax.dynamic_index_in_dim(tA, j, 0, keepdims=False), digit, nent),
                _select_ch(lax.dynamic_index_in_dim(tB, j, 0, keepdims=False), digit, nent),
                _select_ch(lax.dynamic_index_in_dim(tr, j, 0, keepdims=False), digit, nent),
            )
            return rns_montmul(acc, ent, ctx, cs)

        acc = lax.fori_loop(0, nw, body, acc)
    res = rns_montmul(
        acc,
        (jnp.ones_like(acc[0]), jnp.ones_like(acc[1]), jnp.ones_like(acc[2])),
        ctx, cs,
    )
    xi = _mulmod_ch(res[0], cs.invMAk, cs.pA, cs.rA)
    parts = _ext_dot(xi, cs.Wbin)
    return parts[0][0], parts[0][1], parts[1][0], parts[1][1]


def rns_make_tables(ctx: RnsCtx, n_ints, bases, max_ebits: int, nbits: int):
    """Host wrapper: bases [k, ...batch] object ints -> per-base table
    triples in RNS-Montgomery form."""
    b = np.asarray(bases, dtype=object)
    n_b = np.broadcast_to(np.asarray(n_ints, dtype=object), b.shape)
    par = RnsParams(nbits)
    x_l = jnp.asarray(batch_to_limbs(np.mod(b, n_b), par.Lin))
    A, B, r = _to_residues_kernel(x_l, *par.dev_consts())
    nw = -(-max_ebits // WINDOW)
    # the k (bases) axis rides as a leading batch dim of one build launch
    tA, tB, tr = _rns_make_fixed_table(A, B, r, ctx, nw=nw, nbits=nbits)
    k = b.shape[0]
    return [
        (tA[:, :, i], tB[:, :, i], tr[:, :, i]) for i in range(k)
    ]


def rns_fixed_prod_dispatch(ctx: RnsCtx, n_ints, tables, exps, ebits_list,
                            nbits: int, gmap=None):
    """Launch the squaring-free fixed-base product; returns RnsLazy.

    Pallas path (TPU): the kernel streams each base's table as [nw, G*16]
    entry rows (G = flattened key-group count), so it serves both the G=1
    shared-key pattern and multi-tenant G>1 batches; all bases in one call
    must share G (true for h1/h2 pairs and the enc-base pair), and G is
    capped to keep the per-window VMEM block small.

    gmap: optional per-element flattened-group row map broadcastable
    (right-aligned) to the call batch shape, for table batches that are
    COMPRESSED relative to the session batch (G groups serving S > G
    sessions).  Requires the Pallas path — the caller must fall back to a
    non-table product when pallas is unavailable."""
    from . import pallas_rns

    if pallas_rns.pallas_enabled():
        gs = {
            int(np.prod(t[0].shape[2:-1], dtype=np.int64)) for t in tables
        }
        if len(gs) == 1 and gs.pop() * 16 <= 512:
            return pallas_rns.fixed_prod_dispatch(
                ctx, n_ints, tables, exps, ebits_list, nbits, gmap=gmap
            )
    if gmap is not None:
        raise RuntimeError(
            "compressed table groups (gmap) require the Pallas fixed-base "
            "path; callers must fall back before dispatch"
        )
    exps = [np.asarray(e, dtype=object) for e in exps]
    n_arr = np.asarray(n_ints, dtype=object)
    shape = np.broadcast_shapes(n_arr.shape, *(e.shape for e in exps))
    n_b = np.broadcast_to(n_arr, shape)
    es = tuple(
        jnp.asarray(batch_to_limbs(np.broadcast_to(e, shape), nlimbs(eb)))
        for e, eb in zip(exps, ebits_list)
    )
    par = RnsParams(nbits)
    parts = _rns_fixed_prod_kernel(
        tuple(tables), es, ctx, ebits_list=tuple(ebits_list), nbits=nbits
    )
    return RnsLazy(parts=parts, shape=shape, n_b=n_b, MA=par.MA)


import dataclasses as _dc


@_dc.dataclass
class RnsLazy:
    """Dispatched-but-undecoded RNS modexp (async counterpart of
    core.modctx.LazyInts): holds the device partial planes; ints() runs the
    host-side exact recombination.  `mults` are plain factors folded into
    the decode loop (one host pass instead of decode + separate mulmod)."""

    parts: tuple
    shape: tuple
    n_b: np.ndarray
    MA: int
    mults: tuple = ()

    def ints(self) -> np.ndarray:
        return _rns_decode(self.parts, self.shape, self.n_b, self.MA, self.mults)


def rns_exp_dispatch(ctx: RnsCtx, n_ints, base_ints, exp_ints, ebits: int,
                     reduce_axis0: bool = False) -> RnsLazy:
    """Launch x^e mod n via RNS Montgomery; returns an RnsLazy handle.

    reduce_axis0: device-side prod over the leading axis before decode
    (see _rns_exp_kernel) — the ctx/moduli must be size-1 along axis 0.

    On TPU (or with TPU_MPC_PALLAS=1) the exponentiation runs as the fused
    Pallas kernel in core/pallas_rns.py; the XLA kernel below is the
    fallback and the reference for its numerics."""
    from . import pallas_rns

    if pallas_rns.pallas_enabled():
        return pallas_rns.exp_dispatch(
            ctx, n_ints, base_ints, exp_ints, ebits,
            reduce_axis0=reduce_axis0,
        )
    par = RnsParams(ctx.params_nbits)
    base = np.asarray(base_ints, dtype=object)
    expv = np.asarray(exp_ints, dtype=object)
    n_arr = np.asarray(n_ints, dtype=object)
    shape = np.broadcast_shapes(base.shape, expv.shape, n_arr.shape)
    n_b = np.broadcast_to(n_arr, shape)
    x_l = jnp.asarray(batch_to_limbs(np.mod(np.broadcast_to(base, shape), n_b), par.Lin))
    A, B, r = _to_residues_kernel(x_l, *par.dev_consts())
    Le = nlimbs(max(ebits, 1))
    e = jnp.asarray(batch_to_limbs(np.broadcast_to(expv, shape), Le))
    parts = _rns_exp_kernel(
        A, B, r, e, ctx,
        ebits=ebits, nbits=par.nbits, reduce_axis0=reduce_axis0,
    )
    if reduce_axis0:
        shape = (1,) + shape[1:]
        n_b = n_b[:1]
    return RnsLazy(parts=parts, shape=shape, n_b=n_b, MA=par.MA)


def rns_exp(ctx: RnsCtx, n_ints, base_ints, exp_ints, ebits: int) -> np.ndarray:
    """x^e mod n batched via RNS Montgomery: host conversion wrapper."""
    return rns_exp_dispatch(ctx, n_ints, base_ints, exp_ints, ebits).ints()


def _rns_decode(parts, shape, n_b, MA, mults=()) -> np.ndarray:
    if len(parts) == 2:
        # packed planes from the Pallas decode epilogue: v = lo + hi*2^16
        lo, hi = parts
        cols = (
            np.asarray(lo).astype(np.int64)
            + (np.asarray(hi).astype(np.int64) << 16)
        )
    else:
        p00, p01, p10, p11 = parts
        # exact recombination: columns < K*2^32 fit int64
        cols = (
            np.asarray(p00).astype(np.int64)
            + (np.asarray(p01).astype(np.int64) << 8)
            + (np.asarray(p10).astype(np.int64) << 8)
            + (np.asarray(p11).astype(np.int64) << 16)
        )
    # vectorized carry propagation to canonical 16-bit limbs (+ overflow tail)
    Lout = cols.shape[-1]
    flat = cols.reshape(-1, Lout)
    canon = np.zeros((flat.shape[0], Lout + 3), dtype=np.uint32)
    carry = np.zeros(flat.shape[0], dtype=np.int64)
    for c in range(Lout):
        v = flat[:, c] + carry
        canon[:, c] = (v & 0xFFFF).astype(np.uint32)
        carry = v >> 16
    for c in range(Lout, Lout + 3):
        canon[:, c] = (carry & 0xFFFF).astype(np.uint32)
        carry >>= 16
    from .limbs import batch_from_limbs

    v_ints = batch_from_limbs(canon)
    out = np.empty(flat.shape[0], dtype=object)
    flat_n = n_b.reshape(-1)
    fl_m = [
        np.broadcast_to(np.asarray(m, dtype=object), shape).reshape(-1)
        for m in mults
    ]
    for i in range(flat.shape[0]):
        nv = int(flat_n[i])
        v = (int(v_ints[i]) % MA) % nv
        for fm in fl_m:
            v = v * int(fm[i]) % nv
        out[i] = v
    return out.reshape(shape) if shape else out[0]
