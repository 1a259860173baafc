"""Fused Pallas TPU kernels for batched secp256k1 scalar multiplication.

This is the kernel-engineering layer under ec/secp256k1.py, targeting the
r5 profile's dominant block (EC = 49% of the attributed sign profile:
GLV scalar-muls, fixed-base combs, dual ladders, affine trips).  It plays
the role libsecp256k1's hand-written field assembly plays under the
reference (curv's secp256k1 feature, /root/reference/Cargo.toml:26): the
inner-loop substrate every protocol file's Point/Scalar algebra bottoms
out in (e.g. gg_2020/party_i.rs:627-633).

Three design deltas vs the XLA path in secp256k1.py, each targeting a
measured inefficiency:

1. **Limb-major [16 limbs, sessions] layout** with the session axis on the
   128 VPU lanes (the XLA path's [sessions, 16] puts the 16-limb axis on
   the lanes and wastes 7/8 of every VPU op on lane padding).

2. **Complete projective formulas (Renes-Costello-Batina 2015, a=0)**
   instead of Jacobian + exception selects: 12M complete addition and 8M
   doubling with NO branch-free exception machinery at all — no is_zero
   probes, no nested point_double fallback, no infinity selects.  The
   whole ladder is straight-line mul/add/sub on redundant limbs.

3. **Carry-free redundant limb arithmetic.**  Field elements are 16 u32
   limbs < 2^17 ("relaxed"); products accumulate as 31 u32 columns via an
   8/9-bit split of one operand (column sums < 2^30, no overflow), and
   the pseudo-Mersenne fold (2^256 = 2^32 + 977 mod p) plus a vectorized
   1-step renormalization replace every sequential carry chain.  Exact
   canonical limbs are produced only in the kernel epilogue.

Everything — GLV split tables, 33x(4 dbl + k add) window ladders, 8-bit
fixed-base comb with one-hot MXU selects, and the Fermat inversion of
to_affine — runs out of VMEM in one kernel launch per batch tile.

Correctness gates: tests/test_pallas_ec.py runs these kernels in
interpreter mode on CPU against the host EC oracle; on TPU the
auto-enabled path is covered by every protocol test in the suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..host import ec as hec

U32 = jnp.uint32
TILE = 128           # sessions per grid step on TPU (one lane tile)
L = 16               # 16-bit limbs per field element
NENT = 16            # 4-bit window entries (GLV ladders)
GLV_WINDOWS = 33     # ceil(129/4): covers the GLV split bound
COMB_W = 8           # fixed-base comb window bits
COMB_NW = 256 // COMB_W
COMB_NENT = 1 << COMB_W

P_INT = hec.P
B3 = 21              # 3*b for b = 7 (the RCB curve constant)


def use_pallas(B: int) -> bool:
    """Route batches of >= TILE lanes through the kernels when the Pallas
    substrate is on (same knob as the RNS kernels: TPU_MPC_PALLAS)."""
    from ..core.pallas_rns import pallas_enabled

    return pallas_enabled() and B % TILE == 0 and B >= TILE


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# --------------------------------------------------------------------------
# host-side constants
# --------------------------------------------------------------------------

def _msub_limbs() -> np.ndarray:
    """A 16-limb representation of 3p with every limb in [2^17, 2^18):
    the per-limb subtraction offset that makes a + MSUB - b branch-free
    and nonnegative for any relaxed operand b (limbs < 2^17)."""
    V = 3 * P_INT
    limbs = []
    for _ in range(L - 1):
        lj = (V & 0xFFFF) + (1 << 17)
        limbs.append(lj)
        V = (V - lj) >> 16
    assert (1 << 17) <= V < (1 << 18), hex(V)
    limbs.append(V)
    arr = np.asarray(limbs, np.uint64)
    assert int(sum(int(v) << (16 * i) for i, v in enumerate(arr))) == 3 * P_INT
    return arr.astype(np.uint32)


def _limbs16(v: int) -> np.ndarray:
    return np.asarray([(v >> (16 * i)) & 0xFFFF for i in range(L)], np.uint32)


GLV_BETA = 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE


@functools.lru_cache(maxsize=None)
def _const_stack() -> np.ndarray:
    """[16, 8] per-limb constant columns: p, MSUB, beta, zero pad."""
    cols = np.zeros((L, 8), np.uint32)
    cols[:, 0] = _limbs16(P_INT)
    cols[:, 1] = _msub_limbs()
    cols[:, 2] = _limbs16(GLV_BETA)
    return cols


@functools.lru_cache(maxsize=None)
def _pinv_digits() -> np.ndarray:
    """[64, 1] 4-bit digits of p - 2, LSB-first (SMEM input of the
    fused-Fermat affine kernel)."""
    e = P_INT - 2
    return np.asarray(
        [[(e >> (4 * i)) & 0xF] for i in range(64)], np.uint32
    )


# --------------------------------------------------------------------------
# relaxed-limb field arithmetic (kernel-side; [16, T] u32, limbs < 2^17)
# --------------------------------------------------------------------------

def _z(n, T):
    return jnp.zeros((n, T), U32)


def _place(x, before: int, total: int):
    """Pad rows: x placed at row offset `before` in a [total, T] block
    (skips zero-sized parts — Mosaic rejects 0-length vectors)."""
    T = x.shape[1]
    parts = []
    if before:
        parts.append(_z(before, T))
    parts.append(x)
    after = total - before - x.shape[0]
    if after:
        parts.append(_z(after, T))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)


def _renorm(x):
    """One vectorized normalization pass: limbs < 2^22 -> < 2^16 + 2^12
    (strictly < 2^17).  value preserved mod p via the 2^256 = 2^32 + 977
    fold of the shifted-out top.  NO sequential carry chain."""
    T = x.shape[1]
    lo = x & 0xFFFF
    hi = x >> 16
    top = hi[L - 1:L]
    out = lo + jnp.concatenate([_z(1, T), hi[: L - 1]], 0)
    fold = jnp.concatenate([top * 977, _z(1, T), top, _z(L - 3, T)], 0)
    return out + fold


def _fadd(a, b):
    return _renorm(a + b)


def _fsub(a, b, msub):
    return _renorm(a + (msub - b))


def _fneg(b, msub):
    return _renorm(msub - b)


def _fmuli(a, c: int):
    """Multiply by a small host constant (c <= 2^5 used: b3 = 21)."""
    return _renorm(a * jnp.uint32(c))


def _fmul(a, b):
    """Relaxed field multiply mod p.

    Columns accumulate with an 8/9-bit split of b (a_i < 2^17 times
    b chunks < 2^9 summed over 16 terms stays < 2^30), then two
    pseudo-Mersenne folds and two renorm passes.  ~130 traced vector ops,
    zero sequential carries."""
    T = a.shape[1]
    b_lo = b & 0xFF
    b_hi = b >> 8
    acc1 = acc2 = None
    for i in range(L):
        ai = a[i:i + 1]
        p1 = _place(ai * b_lo, i, 31)
        p2 = _place(ai * b_hi, i, 31)
        acc1 = p1 if acc1 is None else acc1 + p1
        acc2 = p2 if acc2 is None else acc2 + p2
    # C = acc1 + 2^8 * acc2 over 32 columns (< 2^29.2)
    l2 = (acc2 & 0xFFFF) << 8
    h2 = (acc2 >> 16) << 8
    C = _place(acc1, 0, 32) + _place(l2, 0, 32) + _place(h2, 1, 32)
    # normalize -> 33 columns < 2^16.2
    D = _place(C & 0xFFFF, 0, 33) + _place(C >> 16, 1, 33)
    # fold 1: 2^256 = 2^32 + 977 (hi spans 17 columns) -> 19 columns
    Dlo, Dhi = D[:L], D[L:]
    E = (_place(Dlo, 0, 19) + _place(Dhi * 977, 0, 19)
         + _place(Dhi, 2, 19))
    F = _place(E & 0xFFFF, 0, 20) + _place(E >> 16, 1, 20)  # < 2^16.1
    Flo, Fhi = F[:L], F[L:]                                 # hi: 4 columns
    G = Flo + _place(Fhi * 977, 0, L) + _place(Fhi, 2, L)
    return _renorm(_renorm(G))


def _fsq(a):
    return _fmul(a, a)


def _carry16(x):
    """Sequential carry propagation to canonical 16-bit limbs (epilogue
    only).  Returns (canonical limbs, carry-out row)."""
    T = x.shape[1]
    rows = []
    c = _z(1, T)
    for i in range(L):
        t = x[i:i + 1] + c
        rows.append(t & 0xFFFF)
        c = t >> 16
    return jnp.concatenate(rows, 0), c


def _canon(x, p):
    """Relaxed (< 2^17 limbs) -> exact canonical (< p) limbs."""
    T = x.shape[1]
    y, c = _carry16(x)
    for _ in range(2):  # fold the (tiny) carry-out back: c*(2^32 + 977)
        fold = jnp.concatenate([c * 977, _z(1, T), c, _z(L - 3, T)], 0)
        y, c = _carry16(y + fold)
    # one conditional subtract (y < 2^256 < 2p)
    rows = []
    b = _z(1, T)
    for i in range(L):
        t = y[i:i + 1] + jnp.uint32(0x10000) - p[i:i + 1] - b
        rows.append(t & 0xFFFF)
        b = 1 - (t >> 16)
    r = jnp.concatenate(rows, 0)
    ge = (b == 0).astype(U32)
    return r * ge + y * (1 - ge)


# --------------------------------------------------------------------------
# complete projective point algebra (RCB 2015, a = 0, b3 = 21)
# --------------------------------------------------------------------------

def _rcb_add(P1, P2, msub):
    """Complete addition (alg. 7): valid for ALL inputs incl. identity
    (0:1:0) and P1 = +-P2.  12 mul + 2 small-const mul."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    t0 = _fmul(X1, X2)
    t1 = _fmul(Y1, Y2)
    t2 = _fmul(Z1, Z2)
    t3 = _fmul(_fadd(X1, Y1), _fadd(X2, Y2))
    t3 = _fsub(_fsub(t3, t0, msub), t1, msub)            # X1Y2 + X2Y1
    t4 = _fmul(_fadd(Y1, Z1), _fadd(Y2, Z2))
    t4 = _fsub(_fsub(t4, t1, msub), t2, msub)            # Y1Z2 + Y2Z1
    t5 = _fmul(_fadd(X1, Z1), _fadd(X2, Z2))
    t5 = _fsub(_fsub(t5, t0, msub), t2, msub)            # X1Z2 + X2Z1
    t0_3 = _fadd(_fadd(t0, t0), t0)                      # 3 X1X2
    t2b = _fmuli(t2, B3)                                 # b3 Z1Z2
    zt = _fadd(t1, t2b)
    t1m = _fsub(t1, t2b, msub)
    yb = _fmuli(t5, B3)                                  # b3 (X1Z2+X2Z1)
    X3 = _fsub(_fmul(t3, t1m), _fmul(t4, yb), msub)
    Y3 = _fadd(_fmul(t1m, zt), _fmul(yb, t0_3))
    Z3 = _fadd(_fmul(zt, t4), _fmul(t0_3, t3))
    return X3, Y3, Z3


def _rcb_dbl(P, msub):
    """Complete doubling (alg. 9): 8 mul + 1 small-const mul."""
    X, Y, Z = P
    t0 = _fmul(Y, Y)
    z3 = _fadd(t0, t0)
    z3 = _fadd(z3, z3)
    z3 = _fadd(z3, z3)                                   # 8 Y^2
    t1 = _fmul(Y, Z)
    t2 = _fmuli(_fmul(Z, Z), B3)                         # b3 Z^2
    x3 = _fmul(t2, z3)
    y3 = _fadd(t0, t2)
    z3 = _fmul(t1, z3)
    t1b = _fadd(t2, t2)
    t2b = _fadd(t1b, t2)
    t0b = _fsub(t0, t2b, msub)
    y3 = _fadd(x3, _fmul(t0b, y3))
    x3 = _fmul(t0b, _fmul(X, Y))
    x3 = _fadd(x3, x3)
    return x3, y3, z3


def _identity(T):
    one = jnp.concatenate([jnp.ones((1, T), U32), _z(L - 1, T)], 0)
    return _z(L, T), one, _z(L, T)


def _pack(P):
    return jnp.concatenate(list(P), 0)            # [48, T]


def _unpack(rows):
    return rows[:L], rows[L:2 * L], rows[2 * L:3 * L]


def _jac_in(rows):
    """Jacobian (X, Y, Z) rows -> homogeneous (XZ, Y, Z^3)."""
    Xj, Yj, Zj = _unpack(rows)
    return _fmul(Xj, Zj), Yj, _fmul(_fmul(Zj, Zj), Zj)


def _jac_out(P, p):
    """Homogeneous (U, V, W) -> canonical Jacobian (UW, VW^2, W).
    Identity (W = 0) maps to Z = 0 (the XLA-side infinity marker)."""
    U, V, W = P
    Xo = _fmul(U, W)
    Yo = _fmul(V, _fmul(W, W))
    return jnp.concatenate([_canon(Xo, p), _canon(Yo, p), _canon(W, p)], 0)


# --------------------------------------------------------------------------
# kernel 1: GLV window ladder (variable base, ns in {2, 4} digit streams)
# --------------------------------------------------------------------------

def _ladder_kernel(ns: int, cst, pt, dg, neg, out, tb, strm):
    """ns//2 base points -> ns GLV digit streams over 33 shared doubling
    windows.  Per-base 16-entry tables are built in VMEM scratch with
    complete adds; stream tables apply the per-lane GLV signs and the
    beta endomorphism in place."""
    T = pt.shape[1]
    C = cst[:]
    p, msub, beta = C[:, 0:1], C[:, 1:2], C[:, 2:3]
    nbases = ns // 2

    ident = _pack(_identity(T))
    for m in range(nbases):
        base = _jac_in(pt[m * 48:(m + 1) * 48])
        tb[m * NENT] = ident
        tb[m * NENT + 1] = _pack(base)

        def tbody(d, _, m=m, base=base):
            prev = _unpack(tb[pl.ds(m * NENT + d - 1, 1)][0])
            tb[pl.ds(m * NENT + d, 1)] = _pack(_rcb_add(prev, base, msub))[None]
            return 0

        lax.fori_loop(2, NENT, tbody, 0)

    def dbody(d, _):
        for s in range(ns):
            m, phi = divmod(s, 2)
            e = tb[pl.ds(m * NENT + d, 1)][0]
            X, Y, W = _unpack(e)
            if phi:
                X = _fmul(X, beta)
            mask = neg[s:s + 1]                   # [1, T] 0/1
            Y = _fneg(Y, msub) * mask + Y * (1 - mask)
            strm[pl.ds(s * NENT + d, 1)] = jnp.concatenate([X, Y, W], 0)[None]
        return 0

    lax.fori_loop(0, NENT, dbody, 0)

    def jbody(j, acc):
        wj = GLV_WINDOWS - 1 - j
        for _ in range(4):
            acc = _rcb_dbl(acc, msub)

        def sbody(s, acc):
            dgr = dg[pl.ds(s * GLV_WINDOWS + wj, 1)]            # [1, T]
            selv = None
            for k in range(NENT):
                mask = (dgr == k).astype(U32)
                e = strm[pl.ds(s * NENT + k, 1)][0] * mask
                selv = e if selv is None else selv + e
            return _rcb_add(acc, _unpack(selv), msub)

        return lax.fori_loop(0, ns, sbody, acc)

    acc = lax.fori_loop(0, GLV_WINDOWS, jbody, _identity(T))
    out[:] = _jac_out(acc, p)


@functools.partial(jax.jit, static_argnames=("ns", "tile", "interp"))
def _ladder_call(cst, PT, DG, NEG, ns: int, tile: int, interp: bool):
    nbases = ns // 2
    B = PT.shape[1]
    col = lambda rows: pl.BlockSpec((rows, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)
    fix = pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ladder_kernel, ns),
        grid=(B // tile,),
        in_specs=[fix, col(nbases * 48), col(ns * GLV_WINDOWS), col(ns)],
        out_specs=col(48),
        out_shape=jax.ShapeDtypeStruct((48, B), U32),
        scratch_shapes=[
            pltpu.VMEM((nbases * NENT, 48, tile), U32),
            pltpu.VMEM((ns * NENT, 48, tile), U32),
        ],
        interpret=interp,
    )(cst, PT, DG, NEG)


# --------------------------------------------------------------------------
# kernel 2: 8-bit fixed-base comb (zero doublings, one-hot MXU selects)
# --------------------------------------------------------------------------

def _comb_kernel(cst, tabw, dgw, out, accS):
    """One grid step = one 8-bit window of the fixed base: one-hot MXU
    select of the affine entry (bf16 chunk planes, exact), one complete
    add.  The accumulator persists in VMEM scratch across the window axis;
    identity entries (digit 0) ride the complete formulas via W = 0."""
    T = dgw.shape[2]
    C = cst[:]
    p, msub = C[:, 0:1], C[:, 1:2]
    w = pl.program_id(1)
    nw = pl.num_programs(1)

    @pl.when(w == 0)
    def _():
        accS[:] = _pack(_identity(T))

    dgr = dgw[0]                                        # [1, T]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (COMB_NENT, T), 0)
        == dgr.astype(jnp.int32)
    ).astype(jnp.bfloat16)
    sel = jax.lax.dot_general(
        tabw[0], onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    su = sel.astype(jnp.int32).astype(U32)              # [64, T]
    X = su[:L] + (su[L:2 * L] << 8)
    Y = su[2 * L:3 * L] + (su[3 * L:] << 8)
    W = jnp.concatenate([(dgr != 0).astype(U32), _z(L - 1, T)], 0)

    acc = _unpack(accS[:])
    acc = _rcb_add(acc, (X, Y, W), msub)
    accS[:] = _pack(acc)

    @pl.when(w == nw - 1)
    def _():
        out[:] = _jac_out(acc, p)


@functools.partial(jax.jit, static_argnames=("tile", "interp"))
def _comb_call(cst, TAB, DG, tile: int, interp: bool):
    B = DG.shape[2]
    nw = TAB.shape[0]
    col = lambda rows: pl.BlockSpec((rows, tile), lambda i, w: (0, i),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _comb_kernel,
        grid=(B // tile, nw),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * L, COMB_NENT), lambda i, w: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, w: (w, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=col(48),
        out_shape=jax.ShapeDtypeStruct((48, B), U32),
        scratch_shapes=[pltpu.VMEM((48, tile), U32)],
        interpret=interp,
    )(cst, TAB, DG)


# --------------------------------------------------------------------------
# kernel 3: fused to_affine (Fermat inversion + projection)
# --------------------------------------------------------------------------

def _affine_kernel(cst, expd, pt, out, tabz):
    """Z^(p-2) via a 4-bit window ladder whose digits are SMEM scalars
    (the exponent is the fixed constant p-2, shared by every lane), then
    x = X/Z^2, y = Y/Z^3 canonicalized.  Z = 0 rows invert a dummy 1
    (the caller masks infinity)."""
    T = pt.shape[1]
    C = cst[:]
    p, msub = C[:, 0:1], C[:, 1:2]
    X, Y, Z = _unpack(pt[:])
    zflag = (jnp.max(Z.astype(jnp.int32), axis=0, keepdims=True)
             == 0).astype(U32)
    z = Z + jnp.concatenate([zflag, _z(L - 1, T)], 0)

    _, one, _ = _identity(T)
    tabz[0] = one
    tabz[1] = z

    def tbody(d, _):
        tabz[pl.ds(d, 1)] = _fmul(tabz[pl.ds(d - 1, 1)][0], z)[None]
        return 0

    lax.fori_loop(2, NENT, tbody, 0)

    def body(j, acc):
        for _ in range(4):
            acc = _fsq(acc)
        d = expd[63 - j, 0]
        return _fmul(acc, tabz[pl.ds(d, 1)][0])

    zinv = lax.fori_loop(0, 64, body, one)
    zi2 = _fmul(zinv, zinv)
    x = _fmul(X, zi2)
    y = _fmul(Y, _fmul(zi2, zinv))
    out[:] = jnp.concatenate([_canon(x, p), _canon(y, p)], 0)


@functools.partial(jax.jit, static_argnames=("tile", "interp"))
def _affine_call(cst, expd, PT, tile: int, interp: bool):
    B = PT.shape[1]
    col = lambda rows: pl.BlockSpec((rows, tile), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _affine_kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((L, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            col(48),
        ],
        out_specs=col(2 * L),
        out_shape=jax.ShapeDtypeStruct((2 * L, B), U32),
        scratch_shapes=[pltpu.VMEM((NENT, L, tile), U32)],
        interpret=interp,
    )(cst, expd, PT)


# --------------------------------------------------------------------------
# dispatch (XLA-side packing: [B, 16] batch-major <-> [rows, B] limb-major)
# --------------------------------------------------------------------------

@jax.jit
def _pack_point(X, Y, Z):
    return jnp.concatenate([X.T, Y.T, Z.T], 0)


@jax.jit
def _unpack_point(rows):
    return rows[:L].T, rows[L:2 * L].T, rows[2 * L:].T


def _digits33(ks):
    """[B, 16] scalar limbs -> [33, B] 4-bit window digits."""
    B = ks.shape[0]
    d = jnp.stack([(ks >> s) & 0xF for s in (0, 4, 8, 12)], axis=-1)
    return d.reshape(B, 64).T[:GLV_WINDOWS]


@jax.jit
def _glv_prep(k):
    """Scalar batch -> (digit rows [66, B], neg rows [2, B]) via the
    existing XLA GLV lattice split."""
    from . import secp256k1 as ec

    k1s, n1, k2s, n2 = ec._glv_split(k)
    DG = jnp.concatenate([_digits33(k1s), _digits33(k2s)], 0)
    NEG = jnp.stack([n1.astype(U32), n2.astype(U32)], 0)
    return DG, NEG


def glv_mul(k, p) -> "tuple":
    """k * P for flat [B, 16] inputs, B a multiple of TILE.  Returns the
    Jacobian coordinate arrays ([B,16] x3, canonical)."""
    from . import secp256k1 as ec

    B = k.shape[0]
    DG, NEG = _glv_prep(k)
    PT = _pack_point(p.X, p.Y, p.Z)
    cst = jnp.asarray(_const_stack())
    tile = TILE if not _interpret() else min(TILE, B)
    out = _ladder_call(cst, PT, DG, NEG, ns=2, tile=tile,
                       interp=_interpret())
    return ec.Point(*_unpack_point(out))


def dual_mul(ka, pa, kb, pb):
    """ka * PA + kb * PB in one 4-stream ladder."""
    from . import secp256k1 as ec

    B = ka.shape[0]
    DGa, NEGa = _glv_prep(ka)
    DGb, NEGb = _glv_prep(kb)
    DG = jnp.concatenate([DGa, DGb], 0)
    NEG = jnp.concatenate([NEGa, NEGb], 0)
    PT = jnp.concatenate(
        [_pack_point(pa.X, pa.Y, pa.Z), _pack_point(pb.X, pb.Y, pb.Z)], 0
    )
    cst = jnp.asarray(_const_stack())
    tile = TILE if not _interpret() else min(TILE, B)
    out = _ladder_call(cst, PT, DG, NEG, ns=4, tile=tile,
                       interp=_interpret())
    return ec.Point(*_unpack_point(out))


# fixed-base comb tables: base (x, y) -> bf16 chunk planes [nw, 64, 256]
_COMB8_CACHE: dict = {}


def _comb8_for(base_xy):
    if base_xy not in _COMB8_CACHE:
        tab = np.zeros((COMB_NW, COMB_NENT, 4 * L), np.uint32)
        base = base_xy
        for j in range(COMB_NW):
            acc = None
            for d in range(1, COMB_NENT):
                acc = hec.add(acc, base)
                xl = _limbs16(acc[0])
                yl = _limbs16(acc[1])
                tab[j, d, :L] = xl & 0xFF
                tab[j, d, L:2 * L] = xl >> 8
                tab[j, d, 2 * L:3 * L] = yl & 0xFF
                tab[j, d, 3 * L:] = yl >> 8
            # d = 0: affine rows stay (0, 0) -> identity (0:1:0) via the
            # kernel's Y = rows + 1-fill?  encode Y = 1 so V = 1.
            tab[j, 0, 2 * L] = 1
            for _ in range(COMB_W):
                base = hec.add(base, base)
        planes = np.transpose(tab, (0, 2, 1)).astype(np.float32)
        _COMB8_CACHE[base_xy] = jnp.asarray(planes.astype(jnp.bfloat16))
    return _COMB8_CACHE[base_xy]


@jax.jit
def _comb_digits(k):
    """[B, 16] limbs -> [32, 1, B] 8-bit window digits."""
    B = k.shape[0]
    d = jnp.stack([k & 0xFF, k >> 8], axis=-1).reshape(B, 2 * L).T
    return d.reshape(COMB_NW, 1, B)


def comb_mul(k, base_xy):
    """k * B for a public fixed base via the 8-bit comb kernel."""
    from . import secp256k1 as ec

    B = k.shape[0]
    TAB = _comb8_for(base_xy)
    DG = _comb_digits(k)
    cst = jnp.asarray(_const_stack())
    tile = TILE if not _interpret() else min(TILE, B)
    out = _comb_call(cst, TAB, DG, tile=tile, interp=_interpret())
    return ec.Point(*_unpack_point(out))


def affine(p):
    """Fused to_affine for flat [B, 16] Jacobian batches: (x, y, inf)."""
    import jax.numpy as jnp  # noqa: F811
    from ..core import bigint as bi

    B = p.X.shape[0]
    PT = _pack_point(p.X, p.Y, p.Z)
    cst = jnp.asarray(_const_stack())
    expd = jnp.asarray(_pinv_digits())
    tile = TILE if not _interpret() else min(TILE, B)
    out = _affine_call(cst, expd, PT, tile=tile, interp=_interpret())
    x, y = out[:L].T, out[L:].T
    inf = bi.is_zero(p.Z)
    zero = jnp.zeros_like(x)
    return bi.select(~inf, x, zero), bi.select(~inf, y, zero), inf
