"""Hand-tiled Pallas TPU kernels for the RNS Montgomery modexp substrate.

This is the kernel-engineering layer under core/rns.py: the same
Bajard-Imbert RNS Montgomery algorithm (approximate first base extension,
exact Shenoy-Kumaresan second extension through a redundant 2^16 channel),
but fused into single Pallas kernels so an entire fixed-window
exponentiation — table build, every squaring/multiply, canonicalization —
runs out of VMEM with zero HBM round-trips between montmuls.  It replaces
the role GMP's hand-tuned mpn_* assembly plays under the reference
(rust-gmp via curv, /root/reference/Cargo.toml:29): the inner-loop
substrate all of utilities/mta/range_proofs.rs, zk_pdl_with_slack/mod.rs
and kzen-paillier modexps bottom out in.

Three design deltas vs the XLA path in core/rns.py, each targeting a
measured bottleneck (the r4 profile put the pure-XLA lowering at ~2.8% MFU,
VPU-bound):

1. **Channel-major layout [channels, sessions]** with the session axis on
   the 128 VPU lanes.  The residue channel count (K = 130 at 2048-bit) is
   2% over a lane tile, so the XLA layout [sessions, K] wastes ~half of
   every VPU op on lane padding; channel-major pads 130 -> 136 sublanes
   (4.6%) instead, and makes the per-channel constants (p, pinv, power
   folds) broadcast along lanes for free.

2. **Channel-level Montgomery arithmetic (R = 2^16 per 16-bit prime)**.
   The XLA path reduces u32 products with a 6-iteration shift-fold chain
   (~30 VPU ops per mulmod); here every channel holds x*2^16 mod p and a
   product reduces with one Montgomery step
       mred(t) = (t >> 16) + ((t*pinv & 0xffff)*p >> 16) + (t&0xffff != 0)
   (~9 ops, output < 2^16 + p, one conditional subtract to stay lazy).
   All domain factors are folded into precomputed per-channel power
   constants (e.g. the first-extension combine emits q_hat*N*2^16 mod p
   directly through one constant N*2^64 mod p), so no value is ever
   converted between domains on the hot path.

3. **Exact bf16 MXU base-extension dots.**  16-bit residues split into
   8-bit chunks; chunk dots run as bf16 x bf16 -> f32 matmuls (exact:
   products < 2^16, accumulation < K*255^2 < 2^24 <= f32 integer range),
   with the weight matrices baked into the kernel as compile-time bf16
   constants.  Zero-padded weight rows make the sublane padding exact.

The kernels return big-Montgomery-form plain residues; the caller strips
the MA factor and decodes with the existing XLA/host machinery in
core/rns.py, so the numeric contract (and the host decode) is unchanged.

Correctness gates: tests/test_pallas.py runs these kernels in interpreter
mode on CPU against python pow(); on TPU the auto-enabled path is covered
by every RNS test in the suite.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import LIMB_BITS
from .rns import P_R, RnsParams, WINDOW

U32 = jnp.uint32
TILE = 128          # sessions per grid step (one lane tile)
_NENT = 1 << WINDOW


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def pallas_enabled() -> bool:
    """TPU_MPC_PALLAS=1 force on (interpret mode off-TPU), =0 off, unset =
    auto (on when the default backend is TPU).  Read per call (ADVICE r4)."""
    env = os.environ.get("TPU_MPC_PALLAS")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=None)
class PallasParams:
    """Per-width compile-time constants for the fused kernels.

    Row layout: the "P block" stacks the A-base channels (rows 0..K-1,
    zero-padded to PR = pad8(K)) and the redundant 2^16 channel (row PR,
    padded block of 8), PRr = PR + 8 rows total.  The "Q block" is the
    B-base channels padded to QR = pad8(Kp).  The first-extension output
    gets the same treatment transposed: B-channel columns 0..Kp-1 of W1
    (padded to QR) then the r column at QR.
    """

    def __init__(self, nbits: int):
        par = RnsParams(nbits)
        self.par = par
        K, Kp = par.K, par.Kp
        self.K, self.Kp = K, Kp
        self.PR = _pad8(K)
        self.PRr = self.PR + 8
        self.QR = _pad8(Kp)

        padA = self.PR - K
        padB = self.QR - Kp
        FILL = 65521  # any valid 16-bit prime: keeps garbage rows bounded

        def col(v, pad):
            return np.concatenate([np.asarray(v, np.uint32),
                                   np.full(pad, FILL, np.uint32)])

        pA = col(par.pA_arr, padA)
        pB = col(par.pB_arr, padB)
        # -p^{-1} mod 2^16 per channel (Montgomery step constant)
        pinv = lambda ps: np.asarray(
            [(-pow(int(p), -1, 1 << 16)) % (1 << 16) for p in ps], np.uint32
        )
        self.pA, self.pB = pA[:, None], pB[:, None]
        self.pinvA, self.pinvB = pinv(pA)[:, None], pinv(pB)[:, None]
        pw = lambda ps, k: np.asarray(
            [pow(2, k, int(p)) for p in ps], np.uint32
        )[:, None]
        self.R2A = pw(pA, 32)     # 2^32 mod p: plain -> channel-Mont
        self.R2B = pw(pB, 32)
        self.C64A = pw(pA, 64)    # combine: out*2^-32 -> out*2^16
        # MB*2^32 mod pA: alpha (true small) -> (alpha*MB) in Mont form
        self.MB32A = np.asarray(
            [pow(par.MB % int(p) * pow(2, 32, int(p)), 1, int(p)) % int(p)
             for p in pA], np.uint32
        )[:, None]
        # invMA_B * 2^16 mod pB (Mont-scaled so t stays in Mont form)
        invMA_B = np.concatenate([par.invMA_B, np.ones(padB, np.uint32)])
        self.invMA_B16 = np.asarray(
            [int(v) * pow(2, 16, int(p)) % int(p)
             for v, p in zip(invMA_B, pB)], np.uint32
        )[:, None]
        # invMBj plain (xi2 = mont(t~, invMBj) emits TRUE values)
        self.invMBj = np.concatenate(
            [par.invMBj, np.zeros(padB, np.uint32)]
        )[:, None]
        # per-width r-channel scalars
        self.invMA_r = int(par.invMA_r)
        self.invMB_r = int(par.invMB_r)

        # ext-1 weights: [K, Kp(+pad) | r] -> bf16 chunk pair [PR, QR + 8]
        W1 = np.zeros((self.PR, self.QR + 8), np.uint32)
        W1[:K, :Kp] = par.W1[:, :-1]
        W1[:K, self.QR] = par.W1[:, -1]
        # ext-2 weights: [Kp, K(+pad) | r] -> [QR, PR + 8]
        W2 = np.zeros((self.QR, self.PR + 8), np.uint32)
        W2[:Kp, :K] = par.W2[:, :-1]
        W2[:Kp, self.PR] = par.W2[:, -1]
        chunks = lambda W: (
            (W & 0xFF).astype(jnp.bfloat16), (W >> 8).astype(jnp.bfloat16)
        )
        self.W1T_lo, self.W1T_hi = (np.asarray(c.T) for c in chunks(W1))
        self.W2T_lo, self.W2T_hi = (np.asarray(c.T) for c in chunks(W2))
        # R16 = 2^16 mod p: the channel-Mont form of integer 1 (the big
        # from_mont multiplies by it in the in-kernel decode epilogue)
        self.R16A = pw(pA, 16)
        self.R16B = pw(pB, 16)
        # invMAk plain (decode epilogue: xi = res * invMAk, true values)
        self.invMAk = np.concatenate(
            [par.invMAk, np.zeros(padA, np.uint32)]
        )[:, None]
        # per-channel constant stacks (kernel inputs: Pallas kernels cannot
        # close over array constants): columns are
        #   P: pA, pinvA, R2A, C64A, MB32A, R16A, invMAk
        #   Q: pB, pinvB, R2B, invMA_B16, invMBj, R16B
        self.constP = np.concatenate(
            [self.pA, self.pinvA, self.R2A, self.C64A, self.MB32A,
             self.R16A, self.invMAk,
             np.zeros((self.PR, 1), np.uint32)], axis=1)
        self.constQ = np.concatenate(
            [self.pB, self.pinvB, self.R2B, self.invMA_B16, self.invMBj,
             self.R16B,
             np.zeros((self.QR, 2), np.uint32)], axis=1)
        # decode weights: Wbin[k, l] = l-th 16-bit limb of MA/p_k, as bf16
        # chunk pair [LoutR, PR] (zero pad rows/cols exact)
        self.Lout = par.Lout
        self.LoutR = _pad8(par.Lout)
        Wb = np.zeros((self.PR, self.LoutR), np.uint32)
        Wb[:K, : par.Lout] = par.Wbin
        self.WbT_lo = np.asarray((Wb & 0xFF).astype(jnp.bfloat16).T)
        self.WbT_hi = np.asarray((Wb >> 8).astype(jnp.bfloat16).T)


# --------------------------------------------------------------------------
# channel-level Montgomery primitives (VPU)
# --------------------------------------------------------------------------

def _mred_lazy(t, p, pinv):
    """t*2^-16 mod p for u32 t (t + m*p computed overflow-free).
    Output < 2^16 (lazy)."""
    m = (t * pinv) & 0xFFFF
    mp = m * p
    out = (t >> 16) + (mp >> 16) + ((t & 0xFFFF) != 0).astype(U32)
    return jnp.where(out >= p, out - p, out)


def _canon(t, p):
    """Lazy (< 2^16) -> canonical (< p): one conditional subtract."""
    return jnp.where(t >= p, t - p, t)


def _mont_lazy(a, b, p, pinv):
    """a*b*2^-16 mod p, a,b < 2^16.  Output lazy (< 2^16)."""
    return _mred_lazy(a * b, p, pinv)


def _mont_canon(a, b, p, pinv):
    return _canon(_mont_lazy(a, b, p, pinv), p)


def _chunk_dot(x_true, WT_lo, WT_hi):
    """Exact integer planes of sum_k x[k]*W[k, j] via bf16 MXU dots.

    x_true: [C, T] u32 canonical 16-bit values (garbage pad rows hit only
    zero weight rows).  WT_*: [J, C] bf16 chunk constants.  Returns u32
    planes (P00, Pm, P11) with total = P00 + Pm*2^8 + P11*2^16."""
    bf = lambda v: v.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    lo = bf(x_true & 0xFF)
    hi = bf(x_true >> 8)
    dot = lambda W, x: jax.lax.dot_general(
        W, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    p00 = dot(WT_lo, lo)
    pm = dot(WT_lo, hi) + dot(WT_hi, lo)   # exact: < 2^27 in f32
    p11 = dot(WT_hi, hi)
    u = lambda v: v.astype(jnp.int32).astype(U32)
    return u(p00), u(pm), u(p11)


def _combine(p00, pm, p11, p, pinv, Cmul):
    """Planes -> (plane_total * Cmul * 2^-48) mod p, lazy.

    With Cmul = N*2^64: emits (q_hat*N)*2^16 (Mont) directly;
    with Cmul = 2^64: emits plane_total*2^16 (Mont)."""
    c = _mred_lazy(p00, p, pinv)
    b = _mred_lazy(pm, p, pinv)
    D = c + (b << 8) + p11            # = total*2^-16 mod p, < 2^26.5
    f = _mred_lazy(D, p, pinv)        # = total*2^-32 mod p
    return _mont_lazy(f, Cmul, p, pinv)


# --------------------------------------------------------------------------
# the fused montmul (operates on [C, T] blocks, channel-Mont domain)
# --------------------------------------------------------------------------

class _KC:
    """Traced per-width constants, read once per kernel instance from the
    constant-stack input refs (Pallas kernels cannot capture arrays)."""

    def __init__(self, pp: PallasParams, cstP, cstQ, w1lo, w1hi, w2lo, w2hi,
                 wblo=None, wbhi=None):
        P, Q = cstP[:], cstQ[:]
        self.pA, self.pinvA = P[:, 0:1], P[:, 1:2]
        self.R2A, self.C64A, self.MB32A = P[:, 2:3], P[:, 3:4], P[:, 4:5]
        self.R16A, self.invMAk = P[:, 5:6], P[:, 6:7]
        self.pB, self.pinvB = Q[:, 0:1], Q[:, 1:2]
        self.R2B, self.invMA_B16, self.invMBj = Q[:, 2:3], Q[:, 3:4], Q[:, 4:5]
        self.R16B = Q[:, 5:6]
        self.W1T_lo, self.W1T_hi = w1lo[:], w1hi[:]
        self.W2T_lo, self.W2T_hi = w2lo[:], w2hi[:]
        if wblo is not None:
            self.WbT_lo, self.WbT_hi = wblo[:], wbhi[:]
        self.invMA_r, self.invMB_r = pp.invMA_r, pp.invMB_r


def _montmul(pp: PallasParams, kc: _KC, xA, xr, xB, yA, yr, yB, cA, N64, N_r):
    """Big-RNS montmul x*y*MA^{-1} mod N on channel-Mont representations.

    xA/yA: [PR, T] lazy Mont A-residues; xr/yr: [8, T] plain 2^16 channel;
    xB/yB: [QR, T] lazy Mont B-residues.  cA = (-N^{-1} * invMAk) mod pA
    (plain, per modulus), N64 = N*2^64 mod pB, N_r = N mod 2^16.
    Returns (tA, tr, tB) in the same representation."""
    pA, pinvA = kc.pA, kc.pinvA
    pB, pinvB = kc.pB, kc.pinvB

    # A side: xi = (x*y*2^16) * (-N^-1) * invMAk  (true canonical values)
    sA = _mred_lazy(xA * yA, pA, pinvA)            # (xy)~  Mont
    xi = _mont_canon(sA, cA, pA, pinvA)            # true, < p
    # B side + r channel
    sB = _mred_lazy(xB * yB, pB, pinvB)            # (xy)~  Mont
    sr = (xr * yr) & 0xFFFF

    # first (approximate) extension: planes over [QR | r]
    p00, pm, p11 = _chunk_dot(xi, kc.W1T_lo, kc.W1T_hi)
    qhN = _combine(p00[: pp.QR], pm[: pp.QR], p11[: pp.QR], pB, pinvB,
                   N64)                            # (q_hat*N)~  Mont lazy
    qh_r = (p00[pp.QR:] + (pm[pp.QR:] << 8)) & 0xFFFF

    num = sB + qhN                                  # < 2^17
    num = _canon(_canon(num, 2 * pB), pB)           # canonical < p
    tB = _mont_lazy(num, kc.invMA_B16, pB, pinvB)   # t~  Mont lazy
    t_r = (((sr + qh_r * N_r) & 0xFFFF) * kc.invMA_r) & 0xFFFF

    # second (exact) extension B -> A via the redundant channel
    xi2 = _mont_canon(tB, kc.invMBj, pB, pinvB)     # true, < p
    q00, qm, q11 = _chunk_dot(xi2, kc.W2T_lo, kc.W2T_hi)
    tA_raw = _combine(q00[: pp.PR], qm[: pp.PR], q11[: pp.PR], pA, pinvA,
                      kc.C64A)                      # total~  Mont lazy
    sum_r = (q00[pp.PR:pp.PR + 1] + (qm[pp.PR:pp.PR + 1] << 8)) & 0xFFFF
    alpha = (((sum_r - t_r[0:1]) & 0xFFFF) * kc.invMB_r) & 0xFFFF  # < Kp
    corr = _mont_canon(alpha, kc.MB32A, pA, pinvA)           # (alpha*MB)~
    tA = jnp.where(tA_raw >= corr, tA_raw - corr, tA_raw + pA - corr)
    return tA, t_r, tB


def _to_chmont(kc, vA, vr, vB):
    """Plain channel residues -> channel-Mont (entry conversion)."""
    return (
        _mont_lazy(vA, kc.R2A, kc.pA, kc.pinvA),
        vr,
        _mont_lazy(vB, kc.R2B, kc.pB, kc.pinvB),
    )


def _to_plain(kc, vA, vr, vB):
    """Channel-Mont -> plain canonical residues (exit conversion)."""
    return (
        _canon(_mred_lazy(vA, kc.pA, kc.pinvA), kc.pA),
        vr,
        _canon(_mred_lazy(vB, kc.pB, kc.pinvB), kc.pB),
    )


def _select16(tabA, tabr, tabB, digit):
    """Branch-free masked select of table entry `digit` ([1, T] u32) from
    stacked entries [16, C, T] (constant-time by construction)."""
    accA = accr = accB = None
    for k in range(_NENT):
        m = (digit == k).astype(U32)[0]          # [T]
        a, r, b = tabA[k] * m, tabr[k] * m, tabB[k] * m
        accA = a if accA is None else accA + a
        accr = r if accr is None else accr + r
        accB = b if accB is None else accB + b
    return accA, accr, accB


# --------------------------------------------------------------------------
# kernel 1: fused variable-base modexp
# --------------------------------------------------------------------------

_SHIFTS_MSB = (28, 24, 20, 16, 12, 8, 4, 0)   # window shifts in one e-word
_SHIFTS_LSB = tuple(reversed(_SHIFTS_MSB))


def _decode_epilogue(kc, acc, mm, oLo, oHi):
    """In-kernel from_mont + RNS->binary decode: strip the big-Mont MA
    factor (multiply by ONE, whose channel-Mont form is R16 and whose
    2^16-channel value is 1), form true xi = res*invMAk, and emit the Wbin
    chunk dot as TWO u32 planes with v = P_lo + P_hi*2^16 — half the
    device->host bytes of the 4-plane XLA path (the tunnel transfer was the
    measured dominant cost of a dispatched modexp)."""
    yA = jnp.broadcast_to(kc.R16A, acc[0].shape)
    yr = jnp.ones_like(acc[1])
    yB = jnp.broadcast_to(kc.R16B, acc[2].shape)
    res = mm(acc, (yA, yr, yB))
    xi = _mont_canon(res[0], kc.invMAk, kc.pA, kc.pinvA)
    p00, pm, p11 = _chunk_dot(xi, kc.WbT_lo, kc.WbT_hi)
    oLo[:] = p00 + ((pm & 0xFF) << 8)
    oHi[:] = (pm >> 8) + p11


def _exp_kernel(pp: PallasParams, ne2: int, emit_planes: bool,
                cstP, cstQ, w1lo, w1hi, w2lo, w2hi, wblo, wbhi,
                xP, xQ, eP, cP, N64, monP, monQ, r2P, r2Q, oX, oY):
    kc = _KC(pp, cstP, cstQ, w1lo, w1hi, w2lo, w2hi, wblo, wbhi)
    PR = pp.PR
    sl = lambda a: (a[:PR], a[PR:])
    cA, N_r = sl(cP[:])
    xA, xr = sl(xP[:])
    xB = xQ[:]
    monA, mon_r = sl(monP[:])
    r2A, r2_r = sl(r2P[:])

    # shared-modulus ctx blocks are [rows, 1]: broadcast the Mont-one to
    # the tile width so the table stack and loop carry are full-width
    one = tuple(
        jnp.broadcast_to(c, (c.shape[0], TILE))
        for c in _to_chmont(kc, monA, mon_r, monQ[:])
    )
    r2m = _to_chmont(kc, r2A, r2_r, r2Q[:])
    x_m = _to_chmont(kc, xA, xr, xB)
    mm = lambda x, y: _montmul(pp, kc, *x, *y, cA, N64[:], N_r)
    xm = mm(x_m, r2m)                 # to big-Mont: x * MA mod N

    entries = [one, xm]
    for _ in range(_NENT - 2):
        entries.append(mm(entries[-1], xm))
    tabA = jnp.stack([e[0] for e in entries])
    tabr = jnp.stack([e[1] for e in entries])
    tabB = jnp.stack([e[2] for e in entries])

    def body(j, acc):
        # one packed e-word = 8 windows, MSB-first, all shifts static
        row = eP[pl.ds(ne2 - 1 - j, 1), :]
        for s in _SHIFTS_MSB:
            d = (row >> s) & (_NENT - 1)
            for _ in range(WINDOW):
                acc = mm(acc, acc)
            acc = mm(acc, _select16(tabA, tabr, tabB, d))
        return acc

    acc = lax.fori_loop(0, ne2, body, one)
    if emit_planes:
        _decode_epilogue(kc, acc, mm, oX, oY)
    else:
        rA, rr, rB = _to_plain(kc, *acc)   # big-Mont (MA factor kept)
        oX[:] = jnp.concatenate([rA, rr], axis=0)
        oY[:] = rB


def _const_inputs(pp: PallasParams):
    j = jnp.asarray
    return (j(pp.constP), j(pp.constQ), j(pp.W1T_lo), j(pp.W1T_hi),
            j(pp.W2T_lo), j(pp.W2T_hi), j(pp.WbT_lo), j(pp.WbT_hi))


def _const_specs(pp: PallasParams, ngrid: int):
    fix = lambda *shape: pl.BlockSpec(
        shape, (lambda i: (0, 0)) if ngrid == 1 else (lambda i, w: (0, 0)),
        memory_space=pltpu.VMEM,
    )
    return [
        fix(pp.PR, 8), fix(pp.QR, 8),
        fix(pp.QR + 8, pp.PR), fix(pp.QR + 8, pp.PR),
        fix(pp.PR + 8, pp.QR), fix(pp.PR + 8, pp.QR),
        fix(pp.LoutR, pp.PR), fix(pp.LoutR, pp.PR),
    ]


@functools.partial(jax.jit,
                   static_argnames=("nbits", "ne2", "interp", "emit_planes",
                                    "shared"))
def _exp_call(xP, xQ, eP, cP, N64, monP, monQ, r2P, r2Q,
              nbits: int, ne2: int, interp: bool,
              emit_planes: bool = True, shared: bool = False):
    pp = PallasParams(nbits)
    B = xP.shape[1]
    grid = (B // TILE,)
    bspec = lambda rows: pl.BlockSpec((rows, TILE), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)
    # shared moduli: ctx arrays stay [rows, 1] and broadcast in-kernel —
    # no B-wide HBM materialization, no per-tile re-fetch of real data
    cspec = (lambda rows: pl.BlockSpec((rows, 1), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)) \
        if shared else bspec
    in_specs = _const_specs(pp, 1) + [
        bspec(pp.PRr), bspec(pp.QR),
        pl.BlockSpec((ne2, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        cspec(pp.PRr), cspec(pp.QR),
        cspec(pp.PRr), cspec(pp.QR), cspec(pp.PRr), cspec(pp.QR),
    ]
    if emit_planes:
        out_rows = (pp.LoutR, pp.LoutR)
    else:
        out_rows = (pp.PRr, pp.QR)
    out_specs = (bspec(out_rows[0]), bspec(out_rows[1]))
    return pl.pallas_call(
        functools.partial(_exp_kernel, pp, ne2, emit_planes),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((out_rows[0], B), jnp.uint32),
            jax.ShapeDtypeStruct((out_rows[1], B), jnp.uint32),
        ),
        interpret=interp,
    )(*_const_inputs(pp), xP, xQ, eP, cP, N64, monP, monQ, r2P, r2Q)


# --------------------------------------------------------------------------
# kernel 2: fixed-base window product (zero squarings, streamed tables)
# --------------------------------------------------------------------------

def _fixed_kernel(pp: PallasParams, total_w2: int, nent: int,
                  cstP, cstQ, w1lo, w1hi, w2lo, w2hi, wblo, wbhi,
                  tPlo, tPhi, tQlo, tQhi, eW, gofs, cP, N64, monP, monQ,
                  oLo, oHi, scrA, scrr, scrB):
    """One grid step = one packed e-word = 8 LSB-first windows of one base.
    The accumulator lives in VMEM scratch across the w axis; the final step
    runs the decode epilogue into the plane outputs."""
    kc = _KC(pp, cstP, cstQ, w1lo, w1hi, w2lo, w2hi, wblo, wbhi)
    w = pl.program_id(1)
    PR = pp.PR
    sl = lambda a: (a[:PR], a[PR:])
    cA, N_r = sl(cP[:])
    mm = lambda x, y: _montmul(pp, kc, *x, *y, cA, N64[:], N_r)

    @pl.when(w == 0)
    def _():
        monA, mon_r = sl(monP[:])
        a, r, b = _to_chmont(kc, monA, mon_r, monQ[:])
        scrA[:] = jnp.broadcast_to(a, (a.shape[0], TILE))
        scrr[:] = jnp.broadcast_to(r, (r.shape[0], TILE))
        scrB[:] = jnp.broadcast_to(b, (b.shape[0], TILE))

    # one-hot selects via exact f32 dots: table entries are channel-Mont
    # (prepared once by _prep_tables), laid out [w2, 8, G*16, C] — the 8
    # window tables of this e-word.  The per-lane key-group offset g*16
    # (gofs) folds multi-tenant (G signer groups) serving into the wider
    # one-hot; digits come from 8 static shifts of the packed e-word.
    row = eW[0]                                    # [1, T]
    acc = (scrA[:], scrr[:], scrB[:])
    for k, s in enumerate(_SHIFTS_LSB):
        d = ((row >> s) & (_NENT - 1)) + gofs[:]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (nent, TILE), 0)
            == d.astype(jnp.int32)
        ).astype(jnp.bfloat16)
        dot = lambda t: jax.lax.dot_general(
            t[0, k], onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        u32 = lambda v: v.astype(jnp.int32).astype(U32)
        selP = u32(dot(tPlo) + dot(tPhi) * 256.0)            # [PRr, T]
        selQ = u32(dot(tQlo) + dot(tQhi) * 256.0)            # [QR, T]
        eA, er = sl(selP)
        acc = mm(acc, (eA, er, selQ))

    scrA[:], scrr[:], scrB[:] = acc

    @pl.when(w == total_w2 - 1)
    def _():
        _decode_epilogue(kc, acc, mm, oLo, oHi)


@functools.partial(jax.jit, static_argnames=("nbits", "total_w2", "interp",
                                             "shared"))
def _fixed_call(tPlo, tPhi, tQlo, tQhi, eW, gofs, cP, N64, monP, monQ,
                nbits: int, total_w2: int, interp: bool,
                shared: bool = True):
    pp = PallasParams(nbits)
    B = eW.shape[2]
    nent = tPlo.shape[2]            # G * 16
    grid = (B // TILE, total_w2)
    vmem = pltpu.VMEM
    col = lambda rows: pl.BlockSpec((rows, TILE), lambda i, w: (0, i),
                                    memory_space=vmem)
    cspec = (lambda rows: pl.BlockSpec((rows, 1), lambda i, w: (0, 0),
                                       memory_space=vmem)) if shared else col
    tab = lambda rows: pl.BlockSpec((1, 8, nent, rows),
                                    lambda i, w: (w, 0, 0, 0),
                                    memory_space=vmem)
    eword = pl.BlockSpec((1, 1, TILE), lambda i, w: (w, 0, i),
                         memory_space=vmem)
    return pl.pallas_call(
        functools.partial(_fixed_kernel, pp, total_w2, nent),
        grid=grid,
        in_specs=_const_specs(pp, 2) + [
            tab(pp.PRr), tab(pp.PRr), tab(pp.QR), tab(pp.QR),
            eword,
            pl.BlockSpec((1, TILE), lambda i, w: (0, i), memory_space=vmem),
            cspec(pp.PRr), cspec(pp.QR), cspec(pp.PRr), cspec(pp.QR),
        ],
        out_specs=(col(pp.LoutR), col(pp.LoutR)),
        out_shape=(
            jax.ShapeDtypeStruct((pp.LoutR, B), jnp.uint32),
            jax.ShapeDtypeStruct((pp.LoutR, B), jnp.uint32),
        ),
        scratch_shapes=[
            pltpu.VMEM((pp.PR, TILE), jnp.uint32),
            pltpu.VMEM((8, TILE), jnp.uint32),
            pltpu.VMEM((pp.QR, TILE), jnp.uint32),
        ],
        interpret=interp,
    )(*_const_inputs(pp), tPlo, tPhi, tQlo, tQhi, eW, gofs, cP, N64, monP,
      monQ)


# --------------------------------------------------------------------------
# dispatch-side preparation (XLA): layout, derived constants, packed e-words
# --------------------------------------------------------------------------

def _pad_cols(B: int) -> int:
    Bp = TILE
    while Bp < B:
        Bp *= 2
    return Bp


def _pack_words(e_limbs: np.ndarray) -> np.ndarray:
    """[B, Le] u32 16-bit limbs -> [B, ceil(Le/2)] packed u32 e-words
    (limb 2j in the low half).  The kernels extract window digits with
    static shifts — no host digit loop, half the upload bytes."""
    B, Le = e_limbs.shape
    if Le % 2:
        e_limbs = np.concatenate(
            [e_limbs, np.zeros((B, 1), np.uint32)], axis=1
        )
    return np.ascontiguousarray(e_limbs[:, 0::2] | (e_limbs[:, 1::2] << 16))


@functools.partial(jax.jit, static_argnames=("L",))
def _unpack_residues(xw, L: int, W16A, W16B, pA, pB, rA, rB):
    """Packed u32 e-words [B, ceil(L/2)] -> RNS residues (device unpack +
    the standard binary->residue chunk dot): halves the x upload bytes."""
    from . import rns

    B = xw.shape[0]
    lo = xw & 0xFFFF
    hi = xw >> 16
    x_l = jnp.stack([lo, hi], axis=-1).reshape(B, -1)[:, :L]
    return rns._to_residues_kernel(x_l, W16A, W16B, pA, pB, rA, rB)


@functools.partial(jax.jit, static_argnames=("nbits", "Bp"))
def _prep_x(A, Bres, r, nbits: int, Bp: int):
    """Residue arrays [B, K]/[B, Kp]/[B] -> channel-major padded blocks."""
    pp = PallasParams(nbits)

    def colpad(x, rows):
        x = x.T
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, Bp - x.shape[1])))

    xP = jnp.concatenate(
        [colpad(A, pp.PR), colpad(r[:, None], 8)], axis=0
    )
    return xP, colpad(Bres, pp.QR)


@functools.partial(jax.jit, static_argnames=("nbits", "Cp"))
def _prep_ctx(ctx_arrs, nbits: int, Cp: int):
    """Per-modulus ctx arrays [Bc, K]-style -> channel-major blocks padded
    to Cp columns (Cp=1 for the shared-modulus broadcast path), plus the
    derived constants cA = -N^{-1}*invMAk mod pA and N64 = N*2^64 mod pB."""
    pp = PallasParams(nbits)
    par = pp.par
    from .rns import _mulmod_ch

    def colpad(x, rows):
        x = x.T
        return jnp.pad(x, ((0, rows - x.shape[0]), (0, Cp - x.shape[1])))

    negNinvA, N_B, N_r, monA, monB, mon_r, r2A, r2B, r2_r = ctx_arrs
    j32 = lambda a: jnp.asarray(a, U32)
    pAj, rAj = j32(par.pA_arr), j32(par.rA)
    pBj, rBj = j32(par.pB_arr), j32(par.rB)
    cA = _mulmod_ch(negNinvA, j32(par.invMAk), pAj, rAj)
    R2B_flat = j32([pow(2, 32, int(p)) for p in par.pB])
    N64 = _mulmod_ch(_mulmod_ch(N_B, R2B_flat, pBj, rBj), R2B_flat, pBj, rBj)

    packP = lambda a, rch: jnp.concatenate(
        [colpad(a, pp.PR), colpad(rch[:, None], 8)], axis=0
    )
    return (packP(cA, N_r), colpad(N64, pp.QR),
            packP(monA, mon_r), colpad(monB, pp.QR),
            packP(r2A, r2_r), colpad(r2B, pp.QR))


def _values_shared(n_b: np.ndarray) -> bool:
    """True iff every modulus in the (broadcast) batch is the same value.
    Broadcast object arrays repeat references, so the `is` fast path makes
    this microseconds for the tiled-key (production) pattern."""
    flat = n_b.reshape(-1)
    if flat.shape[0] <= 1:
        return True
    first = flat[0]
    return all((v is first) or (v == first) for v in flat.tolist())


def _ctx_blocks(ctx, shape, Bp: int, n_b=None):
    """-> (shared, (cP, N64, monP, monQ, r2P, r2Q), ctx_flat_arrs).

    shared=True when every modulus in the batch is one value (single-key
    serving, incl. the tiled-key bench pattern): ctx blocks stay [rows, 1]
    and broadcast inside the kernel (cached on the RnsCtx object)."""
    nc = int(np.prod(ctx.monA.shape[:-1], dtype=np.int64))
    shared = nc == 1 or (n_b is not None and _values_shared(n_b))
    if shared:
        key = (ctx.params_nbits, 1)
        cache = getattr(ctx, "_pallas_ctx_cache", None)
        if cache is not None and cache[0] == key:
            return True, cache[1], cache[2]

        def row1(a, has_ch):
            flat = a.reshape((nc, a.shape[-1]) if has_ch else (nc,))
            return flat[:1]

        arrs = [
            row1(ctx.negNinvA, True), row1(ctx.N_B, True),
            row1(ctx.N_r, False), row1(ctx.monA, True),
            row1(ctx.monB, True), row1(ctx.mon_r, False),
            row1(ctx.r2A, True), row1(ctx.r2B, True), row1(ctx.r2_r, False),
        ]
        blocks = _prep_ctx(arrs, ctx.params_nbits, 1)
        ctx._pallas_ctx_cache = (key, blocks, arrs)
        return True, blocks, arrs
    arrs = _ctx_flat(ctx, shape)
    return False, _prep_ctx(arrs, ctx.params_nbits, Bp), arrs


def _ctx_flat(ctx, shape):
    """Broadcast RnsCtx arrays to the operand batch and flatten to [B, C]
    ([B] for the redundant-channel scalars)."""
    B = int(np.prod(shape)) if shape else 1

    def bc(a, has_ch):
        if has_ch:
            a = jnp.broadcast_to(a, tuple(shape) + (a.shape[-1],))
            return a.reshape((B, a.shape[-1]))
        return jnp.broadcast_to(a, shape).reshape((B,))

    return [
        bc(ctx.negNinvA, True), bc(ctx.N_B, True), bc(ctx.N_r, False),
        bc(ctx.monA, True), bc(ctx.monB, True), bc(ctx.mon_r, False),
        bc(ctx.r2A, True), bc(ctx.r2B, True), bc(ctx.r2_r, False),
    ]


@functools.partial(jax.jit, static_argnames=("nbits", "lead"))
def _planes_out(oLo, oHi, nbits: int, lead: int):
    """Kernel plane outputs [LoutR, Bp] -> [lead, Lout] device arrays (the
    exact bytes the host decode needs — minimizes the tunnel transfer)."""
    pp = PallasParams(nbits)
    return oLo[: pp.Lout, :lead].T, oHi[: pp.Lout, :lead].T


@functools.partial(jax.jit, static_argnames=("nbits", "lead", "S"))
def _finish_reduce(oP, oQ, ctx_flat_arrs, nbits: int, lead: int, S: int):
    """Mont-form kernel output -> tree-product over the leading S axis in
    big-Mont form (cross-session batch-verification reduction), then the
    ones-montmul strip + decode planes (XLA; once per reduction)."""
    from . import rns

    pp = PallasParams(nbits)
    par = pp.par
    cs = rns._consts(par)
    rest = lead // S
    tA = oP[: pp.K, :lead].T.reshape(S, rest, pp.K)
    tr = oP[pp.PR, :lead].reshape(S, rest)
    tB = oQ[: pp.Kp, :lead].T.reshape(S, rest, pp.Kp)
    # the reduced output [1, rest] keeps ONE modulus per trailing slot:
    # moduli are constant along axis 0 (the caller's precondition) but may
    # vary along the trailing dims (e.g. per-alice N in the packed MtA
    # verify), so keep the full first S-row [rest, K], not element [0]
    arrs = [a[: min(rest, a.shape[0])] for a in ctx_flat_arrs]
    (negNinvA, N_B, N_r, monA, monB, mon_r, r2A, r2B, r2_r) = arrs
    ctx = rns.RnsCtx(nbits, negNinvA, N_B, N_r, monA, monB, mon_r,
                     r2A, r2B, r2_r)
    # kernel outputs keep the big-Mont MA factor, so the tree-product is
    # Mont-closed: montmul(a*MA, b*MA) = a*b*MA
    acc = (tA, tB, tr)
    while acc[0].shape[0] > 1:
        n = acc[0].shape[0]
        h = n // 2
        pair = rns.rns_montmul(
            tuple(c[:h] for c in acc), tuple(c[n - h:] for c in acc),
            ctx, cs,
        )
        if n % 2:
            pair = tuple(
                jnp.concatenate([p, c[h:h + 1]], axis=0)
                for p, c in zip(pair, acc)
            )
        acc = pair
    res = rns.rns_montmul(
        acc,
        (jnp.ones_like(acc[0]), jnp.ones_like(acc[1]),
         jnp.ones_like(acc[2])),
        ctx, cs,
    )
    xi = rns._mulmod_ch(res[0], cs.invMAk, cs.pA, cs.rA)
    parts = rns._ext_dot(xi, cs.Wbin)
    return parts[0][0], parts[0][1], parts[1][0], parts[1][1]


def exp_dispatch(ctx, n_ints, base_ints, exp_ints, ebits: int,
                 reduce_axis0: bool = False):
    """Pallas counterpart of rns.rns_exp_dispatch (same contract)."""
    from . import rns
    from .limbs import batch_to_limbs, nlimbs

    nbits = ctx.params_nbits
    par = RnsParams(nbits)
    base = np.asarray(base_ints, dtype=object)
    expv = np.asarray(exp_ints, dtype=object)
    n_arr = np.asarray(n_ints, dtype=object)
    shape = np.broadcast_shapes(base.shape, expv.shape, n_arr.shape)
    n_b = np.broadcast_to(n_arr, shape)
    lead = int(np.prod(shape)) if shape else 1
    xw = jnp.asarray(_pack_words(
        batch_to_limbs(np.mod(np.broadcast_to(base, shape), n_b), par.Lin)
        .reshape(lead, par.Lin)
    ))
    A, Bres, r = _unpack_residues(xw, par.Lin, *par.dev_consts())
    A = A.reshape(lead, par.K)
    Bres = Bres.reshape(lead, par.Kp)
    r = r.reshape(lead)

    Le = nlimbs(max(ebits, 1))
    e_l = batch_to_limbs(np.broadcast_to(expv, shape), Le).reshape(lead, Le)
    ew = _pack_words(e_l)
    ne2 = ew.shape[1]
    Bp = _pad_cols(lead)
    eP = jnp.asarray(
        np.ascontiguousarray(np.pad(ew, ((0, Bp - lead), (0, 0))).T)
    )

    shared, blocks, ctx_arrs = _ctx_blocks(ctx, shape, Bp, n_b=n_b)
    cP, N64, monP, monQ, r2P, r2Q = blocks
    xP, xQ = _prep_x(A, Bres, r, nbits, Bp)
    oX, oY = _exp_call(xP, xQ, eP, cP, N64, monP, monQ, r2P, r2Q,
                       nbits=nbits, ne2=ne2, interp=_interpret(),
                       emit_planes=not reduce_axis0, shared=shared)
    if reduce_axis0:
        S = shape[0]
        # ctx_arrs: flat [1, K]-style for shared ctx (finish slices [:1]),
        # [lead, K]-style otherwise — both fit _finish_reduce's contract
        parts = _finish_reduce(oX, oY, ctx_arrs, nbits, lead, S)
        shape = (1,) + shape[1:]
        n_b = n_b[:1]
        return rns.RnsLazy(parts=parts, shape=shape, n_b=n_b, MA=par.MA)
    lo, hi = _planes_out(oX, oY, nbits, lead)
    return rns.RnsLazy(parts=(lo, hi), shape=shape, n_b=n_b, MA=par.MA)


# --------------------------------------------------------------------------
# fixed-base product dispatch
# --------------------------------------------------------------------------

# table-id -> (strong ref, prepared chunk arrays).  Fixed-base tables are
# few and long-lived (per key set), so strong refs are fine.
_PREP_CACHE: dict = {}


@functools.partial(jax.jit, static_argnames=("nbits", "w2"))
def _prep_table_kernel(tA, tB, tr, nbits: int, w2: int):
    """One base's table (plain RNS residues [nw, G16, K]-style) ->
    channel-Mont bf16 chunk stacks [w2, 8, G16, rows] grouped to match the
    8-windows-per-e-word kernel schedule (pad windows repeat window 0 —
    their digit is always 0, selecting the big-Mont ONE entry)."""
    pp = PallasParams(nbits)
    par = pp.par
    from .rns import _mulmod_ch

    j32 = lambda a: jnp.asarray(a, U32)
    R16A = j32([pow(2, 16, int(p)) for p in par.pA])
    R16B = j32([pow(2, 16, int(p)) for p in par.pB])
    tAm = _mulmod_ch(tA, R16A, j32(par.pA_arr), j32(par.rA))
    tBm = _mulmod_ch(tB, R16B, j32(par.pB_arr), j32(par.rB))
    nw = tA.shape[0]
    padw = w2 * 8 - nw

    def stack(x, rows, rch=None):
        # [nw, G16, C] -> [w2, 8, G16, rows(+8)]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, rows - x.shape[2])))
        if rch is not None:
            rpad = jnp.pad(rch[:, :, None], ((0, 0), (0, 0), (0, 7)))
            x = jnp.concatenate([x, rpad], axis=2)
        if padw:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (padw,) + x.shape[1:])], axis=0
            )
        return x.reshape(w2, 8, x.shape[1], x.shape[2])

    P = stack(tAm, pp.PR, rch=tr)                        # [w2, 8, G16, PRr]
    Q = stack(tBm, pp.QR)                                # [w2, 8, G16, QR]
    ch = lambda x: ((x & 0xFF).astype(jnp.bfloat16),
                    (x >> 8).astype(jnp.bfloat16))
    return ch(P) + ch(Q)


def _prep_tables(tables, ebits_list, nbits: int):
    """Concatenate per-base tables along the e-word axis (chunked,
    channel-Mont, [w2, 8, G*16, C] with key groups g stacked as entry rows
    g*16+d), keyed by table identity."""
    from .limbs import nlimbs

    key = tuple(id(t[0]) for t in tables) + tuple(ebits_list)
    hit = _PREP_CACHE.get(key)
    if hit is not None:
        return hit[1]
    if len(_PREP_CACHE) > 32:
        # derived views (take/expand) get fresh ids per protocol pass; cap
        # the cache so stale preps (and their strong refs) don't accumulate
        _PREP_CACHE.clear()
    parts = []
    for (tA, tB, tr), eb in zip(tables, ebits_list):
        nw = -(-eb // WINDOW)
        w2 = (nlimbs(eb) + 1) // 2
        K = tA.shape[-1]
        G = int(np.prod(tA.shape[2:-1], dtype=np.int64))
        # [nw, 16, *b, K] -> [nw, G*16, K] with row order g*16 + d
        rs = lambda t, C: jnp.moveaxis(
            jnp.asarray(t).reshape(t.shape[0], _NENT, G, C), 2, 1
        ).reshape(t.shape[0], G * _NENT, C)
        a = rs(tA, K)[:nw]
        b = rs(tB, tB.shape[-1])[:nw]
        c = jnp.moveaxis(
            jnp.asarray(tr).reshape(tr.shape[0], _NENT, G), 2, 1
        ).reshape(tr.shape[0], G * _NENT)[:nw]
        parts.append(_prep_table_kernel(a, b, c, nbits=nbits, w2=w2))
    out = tuple(
        jnp.concatenate([p[i] for p in parts], axis=0) for i in range(4)
    )
    _PREP_CACHE[key] = (tables, out)
    return out


def fixed_prod_dispatch(ctx, n_ints, tables, exps, ebits_list, nbits: int,
                        gmap=None):
    """Pallas counterpart of rns.rns_fixed_prod_dispatch.

    Precondition (checked by the caller's routing): every base's table has
    the same flattened key-group count G, and the table batch dims
    broadcast against the call batch — OR an explicit `gmap` maps each call
    element to its flattened group row (compressed multi-tenant tables).
    The per-lane group offset g*16 rides as a kernel input; window digits
    come from packed e-words."""
    from . import rns
    from .limbs import batch_to_limbs, nlimbs

    par = RnsParams(nbits)
    exps = [np.asarray(e, dtype=object) for e in exps]
    n_arr = np.asarray(n_ints, dtype=object)
    shape = np.broadcast_shapes(n_arr.shape, *(e.shape for e in exps))
    n_b = np.broadcast_to(n_arr, shape)
    lead = int(np.prod(shape)) if shape else 1
    Bp = _pad_cols(lead)

    bdims = tables[0][0].shape[2:-1]
    G = int(np.prod(bdims, dtype=np.int64))
    gofs = np.zeros((1, Bp), np.uint32)
    if gmap is not None:
        gm = np.broadcast_to(np.asarray(gmap, dtype=np.uint32), shape)
        gofs[0, :lead] = gm.reshape(lead) * _NENT
    elif G > 1:
        gm = np.broadcast_to(
            np.arange(G, dtype=np.uint32).reshape(bdims), shape
        ).reshape(lead)
        gofs[0, :lead] = gm * _NENT

    ews = []
    for e, eb in zip(exps, ebits_list):
        Le = nlimbs(eb)
        e_l = batch_to_limbs(np.broadcast_to(e, shape), Le).reshape(lead, Le)
        ews.append(_pack_words(e_l))
    ew = np.concatenate(ews, axis=1)                  # [lead, total_w2]
    total_w2 = ew.shape[1]
    eW = jnp.asarray(
        np.ascontiguousarray(
            np.pad(ew, ((0, Bp - lead), (0, 0))).T
        ).reshape(total_w2, 1, Bp)
    )

    tPlo, tPhi, tQlo, tQhi = _prep_tables(tables, ebits_list, nbits)
    shared, blocks, ctx_arrs = _ctx_blocks(ctx, shape, Bp, n_b=n_b)
    cP, N64, monP, monQ, _, _ = blocks
    oLo, oHi = _fixed_call(tPlo, tPhi, tQlo, tQhi, eW, jnp.asarray(gofs),
                           cP, N64, monP, monQ,
                           nbits=nbits, total_w2=total_w2,
                           interp=_interpret(), shared=shared)
    lo, hi = _planes_out(oLo, oHi, nbits, lead)
    return rns.RnsLazy(parts=(lo, hi), shape=shape, n_b=n_b, MA=par.MA)
