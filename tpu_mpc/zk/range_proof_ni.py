"""Batched non-interactive Paillier range proof (zk-paillier's RangeProofNi).

Proves that a Paillier ciphertext under ek encrypts a plaintext x < q/3
(soundness bound: x in (-q/3, 2q/3)), per Lindell'17 (eprint 2017/552)
Appendix A — the cut-and-choose protocol the reference consumes through the
external zk-paillier crate (reference call sites:
/root/reference/src/utilities/zk_pdl/mod.rs:87,244-259
`RangeProofNi::{prove,verify}`).

Protocol (REPS parallel repetitions, challenge bits via Fiat-Shamir):
  commit   for each rep: w1 uniform in [q/3, 2q/3), w2 = w1 - q/3,
           randomly swapped; c1 = Enc(w1; r1), c2 = Enc(w2; r2).
  e        = SHA-256(ek.n, cipher, c1..., c2...) -> REPS bits.
  respond  e_i = 0: open both pairs (w1, r1, w2, r2).
           e_i = 1: pick the j with x + wj in [q/3, 2q/3); send
           z = x + wj and masked randomness r * rj mod n.
  verify   opened pairs re-encrypt and have the {w, w - q/3} structure
           with max in [q/3, 2q/3); masked reps satisfy
           Enc(z; r_masked) == cipher * cj mod n^2 and z in [q/3, 2q/3).

All 2*REPS encryptions per slot run as one batched device modexp over a
trailing repetition axis; host ints handle the data-dependent j selection
(that choice is part of the prover's secret logic, not the hot path).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..hashes.fiat_shamir import digest_rows
from ..host import ec as hec
from .range_proofs import PaillierCtxBatch, _mulmod

Q = hec.N
REPS = 40  # zk-paillier STATISTICAL_ERROR_FACTOR


def _encrypt(ek: PaillierCtxBatch, m, r, shape):
    """(1 + m n) r^n mod n^2 with an extra trailing repetition axis."""
    n = np.broadcast_to(ek.n[..., None], shape)
    nn = np.broadcast_to(ek.nn[..., None], shape)
    rn = ek.nn_ctx.expand(ek.n_ctx.n_ints.ndim).pow(r, n, ek.n_ctx.bits)
    return _mulmod(np.broadcast_to(m, shape) * n + 1, rn, nn)


@dataclasses.dataclass
class RangeProofNiBatch:
    """Pairs + responses; batch shape [..., REPS] on the rep leaves."""

    c1: np.ndarray
    c2: np.ndarray
    e: np.ndarray            # [...] challenge ints (REPS low bits used)
    # open responses (valid where the challenge bit is 0, else 0)
    w1: np.ndarray
    r1: np.ndarray
    w2: np.ndarray
    r2: np.ndarray
    # masked responses (valid where the challenge bit is 1, else 0)
    z: np.ndarray
    r_masked: np.ndarray


def _challenge_bits(e, shape):
    """[..., REPS] boolean matrix from the packed challenge ints."""
    bits = np.zeros(shape, dtype=bool)
    flat_e = np.broadcast_to(np.asarray(e, dtype=object), shape[:-1]).reshape(-1)
    fb = bits.reshape(-1, REPS)
    for i, ev in enumerate(flat_e):
        v = int(ev)
        for k in range(REPS):
            fb[i, k] = (v >> k) & 1
    return fb.reshape(shape)


def prove(
    ek: PaillierCtxBatch, cipher, x_ints, r_ints, rng
) -> RangeProofNiBatch:
    """x < q/3 (prover side invariant); cipher = Enc_ek(x; r)."""
    x = np.asarray(x_ints, dtype=object)
    base = np.broadcast_shapes(x.shape, ek.n_ctx.batch_shape, np.shape(cipher))
    shape = base + (REPS,)
    q3 = Q // 3
    n_rep = np.broadcast_to(ek.n[..., None], shape)

    w_hi = rng.below(q3, shape) + q3          # in [q/3, 2q/3)
    w_lo = w_hi - q3
    swap = rng.bits(1, shape).astype(bool)
    w1 = np.where(swap, w_lo, w_hi)
    w2 = np.where(swap, w_hi, w_lo)
    r1 = rng.units_below(n_rep, shape)
    r2 = rng.units_below(n_rep, shape)
    c1 = _encrypt(ek, w1, r1, shape)
    c2 = _encrypt(ek, w2, r2, shape)

    pair_digest = digest_rows(*( [np.broadcast_to(ek.n, base), np.broadcast_to(np.asarray(cipher, dtype=object), base)]
                                + [c1[..., k] for k in range(REPS)]
                                + [c2[..., k] for k in range(REPS)] ))
    e = pair_digest
    bits = _challenge_bits(e, shape)

    # masked responses where bit = 1: choose the pair member that keeps
    # x + w in [q/3, 2q/3)
    xb = np.broadcast_to(x[..., None] if x.shape else np.asarray(x, dtype=object), shape)
    sum1 = np.asarray(xb + w1, dtype=object)
    in_range1 = np.vectorize(lambda v: q3 <= int(v) < 2 * q3, otypes=[bool])(sum1)
    z = np.where(in_range1, sum1, xb + w2)
    rj = np.where(in_range1, r1, r2)
    r_masked = _mulmod(np.broadcast_to(np.asarray(r_ints, dtype=object)[..., None]
                                       if np.shape(r_ints) else np.asarray(r_ints, dtype=object), shape),
                       rj, n_rep)

    zero = np.zeros(shape, dtype=object)
    return RangeProofNiBatch(
        c1=c1, c2=c2, e=e,
        w1=np.where(bits, zero, w1), r1=np.where(bits, zero, r1),
        w2=np.where(bits, zero, w2), r2=np.where(bits, zero, r2),
        z=np.where(bits, z, zero), r_masked=np.where(bits, r_masked, zero),
    )


def verify(proof: RangeProofNiBatch, ek: PaillierCtxBatch, cipher) -> np.ndarray:
    """-> ok mask of the base batch shape."""
    base = np.broadcast_shapes(
        np.shape(proof.c1)[:-1], ek.n_ctx.batch_shape, np.shape(cipher)
    )
    shape = base + (REPS,)
    q3 = Q // 3
    nn_rep = np.broadcast_to(ek.nn[..., None], shape)

    e_check = digest_rows(*( [np.broadcast_to(ek.n, base), np.broadcast_to(np.asarray(cipher, dtype=object), base)]
                             + [proof.c1[..., k] for k in range(REPS)]
                             + [proof.c2[..., k] for k in range(REPS)] ))
    e_ok = e_check == np.broadcast_to(np.asarray(proof.e, dtype=object), base)
    bits = _challenge_bits(proof.e, shape)

    # opened reps: re-encrypt both, check pair structure
    c1_re = _encrypt(ek, proof.w1, np.where(bits, 1, proof.r1), shape)
    c2_re = _encrypt(ek, proof.w2, np.where(bits, 1, proof.r2), shape)
    struct_ok = np.vectorize(
        lambda a, b: (q3 <= int(a) < 2 * q3 and int(a) - int(b) == q3)
        or (q3 <= int(b) < 2 * q3 and int(b) - int(a) == q3),
        otypes=[bool],
    )(proof.w1, proof.w2)
    open_ok = (c1_re == proof.c1) & (c2_re == proof.c2) & struct_ok

    # masked reps: Enc(z; r_masked) == cipher * cj, z in range, for j in {1,2}
    z_re = _encrypt(ek, proof.z, np.where(bits, proof.r_masked, 1), shape)
    cb = np.broadcast_to(np.asarray(cipher, dtype=object)[..., None]
                         if np.shape(cipher) else np.asarray(cipher, dtype=object), shape)
    prod1 = _mulmod(cb, proof.c1, nn_rep)
    prod2 = _mulmod(cb, proof.c2, nn_rep)
    z_ok = np.vectorize(lambda v: q3 <= int(v) < 2 * q3, otypes=[bool])(proof.z)
    mask_ok = ((z_re == prod1) | (z_re == prod2)) & z_ok

    per_rep = np.where(bits, mask_ok, open_ok)
    return e_ok & per_rep.all(axis=-1)
