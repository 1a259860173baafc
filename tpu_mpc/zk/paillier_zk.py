"""Paillier-related ZK proofs: correct-key and composite discrete log.

Re-implementations of the zk-paillier crate's `NiCorrectKeyProof` and
`CompositeDLogProof` (reference call sites: gg_2018/party_i.rs:194,229;
gg_2020/party_i.rs:223-239,283-298), batch-first: the K modexps per proof
run as one device kernel over all sessions/parties.

NOTE: the zk-paillier sources are not available in this environment, so the
challenge derivations below are documented equivalents (same statement, same
soundness argument), not byte-exact ports:

  NiCorrectKeyProof (Paillier-Blum-style N-th-root extraction):
    challenges rho_i = MGF(N, salt, i) mod N for i < K=11;
    proof sigma_i = rho_i^{N^{-1} mod phi(N)} mod N;
    verify: sigma_i^N == rho_i mod N, plus 2047<=|N|<=2048 and no small
    prime factors (the bit-length policing of gg_2020/party_i.rs:287-290
    lives in the protocol layer).

  CompositeDLogProof (Girault identification, order-free):
    statement (N, g, ni) with ni = g^{-x} mod N (gg20 sets h2 = h1^{x0},
    x = phi - x0, so h1^x = h2^{-1}; party_i.rs:137-156);
    prove: r < 2^(2048+256+64); u = g^r mod N; e = H(N, g, ni, u) (256-bit);
    y = r + e x  (integer, no reduction);
    verify: g^y ni^e == u mod N.
"""

from __future__ import annotations

import dataclasses
import hashlib
import math

import numpy as np

from ..core.modctx import ModCtx
from ..host.serde import bigint_to_bytes

SALT_STRING = b"KZen"  # zk_paillier::zkproofs::SALT_STRING (b"\x4b\x5a\x65\x6e")
CORRECT_KEY_K = 11     # number of N-th root challenges
_SMALL_PRIME_BOUND = 1000


def _mgf_below(n: int, salt: bytes, index: int, nbits: int) -> int:
    """Deterministic challenge < n: SHA-256 counter-mode expansion mod n."""
    out = b""
    ctr = 0
    need = (nbits + 7) // 8 + 16
    seed = bigint_to_bytes(n) + salt + index.to_bytes(4, "big")
    while len(out) < need:
        out += hashlib.sha256(seed + ctr.to_bytes(4, "big")).digest()
        ctr += 1
    return int.from_bytes(out[:need], "big") % n


def correct_key_challenges(n: int, bits: int = 2048) -> list[int]:
    return [_mgf_below(n, SALT_STRING, i, bits) for i in range(CORRECT_KEY_K)]


@dataclasses.dataclass
class CorrectKeyProofBatch:
    """sigma values, object ndarray [..., K]."""

    sigma: np.ndarray


def correct_key_prove(n_ctx: ModCtx, phis) -> CorrectKeyProofBatch:
    """phis: object ndarray [...] of phi(N) (secret).  Batched device modexp."""
    shape = n_ctx.batch_shape
    phis = np.broadcast_to(np.asarray(phis, dtype=object), shape)
    rho = np.empty(shape + (CORRECT_KEY_K,), dtype=object)
    m_exp = np.empty(shape + (CORRECT_KEY_K,), dtype=object)
    flat_n = n_ctx.n_ints.reshape(-1)
    flat_phi = phis.reshape(-1)
    fr = rho.reshape(-1, CORRECT_KEY_K)
    fm = m_exp.reshape(-1, CORRECT_KEY_K)
    for b in range(flat_n.shape[0]):
        n = int(flat_n[b])
        minv = pow(n, -1, int(flat_phi[b]))
        ch = correct_key_challenges(n, n_ctx.bits)
        for i in range(CORRECT_KEY_K):
            fr[b, i] = ch[i]
            fm[b, i] = minv
    # challenge axis K broadcasts against the ctx batch via a trailing axis
    sigma = n_ctx.expand(n_ctx.n_ints.ndim).pow(rho, m_exp, ebits_hint=n_ctx.bits)
    return CorrectKeyProofBatch(sigma=sigma)


def correct_key_verify(proof: CorrectKeyProofBatch, n_ctx: ModCtx) -> np.ndarray:
    """-> bool ndarray [...] (all K challenges pass + no tiny factors)."""
    shape = n_ctx.batch_shape
    rho = np.empty(shape + (CORRECT_KEY_K,), dtype=object)
    flat_n = n_ctx.n_ints.reshape(-1)
    fr = rho.reshape(-1, CORRECT_KEY_K)
    small_ok = np.ones(flat_n.shape[0], dtype=bool)
    for b in range(flat_n.shape[0]):
        n = int(flat_n[b])
        ch = correct_key_challenges(n, n_ctx.bits)
        for i in range(CORRECT_KEY_K):
            fr[b, i] = ch[i]
        for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47):
            if n % p == 0:
                small_ok[b] = False
    exps = np.broadcast_to(
        n_ctx.n_ints[..., None], shape + (CORRECT_KEY_K,)
    )
    back = n_ctx.expand(n_ctx.n_ints.ndim).pow(proof.sigma, exps, ebits_hint=n_ctx.bits)
    ok = np.all(back == rho, axis=-1)
    return ok & small_ok.reshape(shape)


@dataclasses.dataclass
class CompositeDLogStatementBatch:
    """(N_tilde, g, ni) batches; the modulus carried as a shared ModCtx."""

    ctx: ModCtx          # N_tilde
    g: np.ndarray        # object ndarray [...]
    ni: np.ndarray


@dataclasses.dataclass
class CompositeDLogProofBatch:
    u: np.ndarray
    y: np.ndarray        # integer response (no modular reduction)


_R_BITS = 2048 + 256 + 64  # statistically hides e*x for x < phi < 2^2048


def _cdlog_challenge(stmt: CompositeDLogStatementBatch, u) -> np.ndarray:
    from ..hashes.fiat_shamir import digest_rows

    return digest_rows(stmt.ctx.n_ints, stmt.g, stmt.ni, u)


def composite_dlog_prove(
    stmt: CompositeDLogStatementBatch, xs, rng
) -> CompositeDLogProofBatch:
    shape = np.broadcast_shapes(stmt.ctx.batch_shape, np.shape(xs))
    xs = np.broadcast_to(np.asarray(xs, dtype=object), shape)
    r = rng.bits(_R_BITS, shape)
    u = stmt.ctx.pow(stmt.g, r, ebits_hint=_R_BITS)
    e = _cdlog_challenge(stmt, u)
    y = e * xs + r
    return CompositeDLogProofBatch(u=u, y=y)


def composite_dlog_verify(
    proof: CompositeDLogProofBatch, stmt: CompositeDLogStatementBatch
) -> np.ndarray:
    e = _cdlog_challenge(stmt, proof.u)
    g_y = stmt.ctx.pow(stmt.g, proof.y, ebits_hint=_R_BITS + 300)
    ni_e = stmt.ctx.pow(stmt.ni, e, ebits_hint=256)
    n = np.broadcast_to(stmt.ctx.n_ints, g_y.shape)
    flat = [np.asarray(a, dtype=object).reshape(-1) for a in (g_y, ni_e, n, proof.u)]
    out = np.empty(flat[0].shape[0], dtype=bool)
    for b in range(flat[0].shape[0]):
        out[b] = int(flat[0][b]) * int(flat[1][b]) % int(flat[2][b]) == int(flat[3][b])
    return out.reshape(g_y.shape)
