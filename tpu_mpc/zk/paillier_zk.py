"""Paillier-related ZK proofs: correct-key and composite discrete log.

Re-implementations of the zk-paillier crate's `NiCorrectKeyProof` and
`CompositeDLogProof` (reference call sites: gg_2018/party_i.rs:194,229;
gg_2020/party_i.rs:223-239,283-298), batch-first: the K modexps per proof
run as one device kernel over all sessions/parties.

  NiCorrectKeyProof (Goldberg et al. non-interactive RSA-modulus
  certification, as implemented by zk-paillier 0.4.3 correct_key_ni.rs):
    salt_bn   = BigInt::from_bytes(b"KZen")
    seed_i    = SHA256(bytes(N) || bytes(salt_bn) || bytes(i))     (chain_bigint)
    rho_i     = mask_generation(|N|, seed_i) mod N,  i < K=11
    mask_generation(bits, s) = sum_j SHA256(bytes(s) || bytes(j)) << (256 j)
                               for j in 0 .. bits//256   (msklen = bits//256 + 1)
    proof     sigma_i = rho_i^{N^{-1} mod phi(N)} mod N   ("extract_nroot")
    verify:   sigma_i^N == rho_i mod N for all i, AND
              gcd(N, primorial of all primes < alpha=6370) == 1.
    The 2047<=|N|<=2048 bit-length policing of gg_2020/party_i.rs:287-290
    lives in the protocol layer.
    (zk-paillier sources are not installable here, so this derivation is
    reconstructed from the published scheme + crate docs; golden fixtures in
    tests/test_fixtures.py pin it against drift.)

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
_SALT_BN = int.from_bytes(SALT_STRING, "big")
CORRECT_KEY_K = 11     # AMOUNT_OF_ROUNDS: soundness 128 / log2(alpha=6370)
_DIGEST_SIZE = 256     # SHA-256 output bits (mask_generation chunk stride)
_ALPHA = 6370          # verifier requires gcd(N, primorial(<alpha)) == 1


def _sha256_bigints(*xs: int) -> int:
    """Sha256::new().chain_bigint(..).result_bigint() (curv DigestExt)."""
    h = hashlib.sha256()
    for x in xs:
        h.update(bigint_to_bytes(x))
    return int.from_bytes(h.digest(), "big")


def mask_generation(out_bits: int, seed: int) -> int:
    """zk-paillier mask_generation: concat SHA-256(seed||j) chunks, chunk j
    shifted left by 256*j (low chunk first)."""
    msklen = out_bits // _DIGEST_SIZE + 1
    acc = 0
    for j in range(msklen):
        acc += _sha256_bigints(seed, j) << (_DIGEST_SIZE * j)
    return acc


def _primorial(bound: int) -> int:
    sieve = np.ones(bound, dtype=bool)
    sieve[:2] = False
    for p in range(2, int(bound ** 0.5) + 1):
        if sieve[p]:
            sieve[p * p :: p] = False
    acc = 1
    for p in np.nonzero(sieve)[0].tolist():
        acc *= int(p)
    return acc


ALPHA_PRIMORIAL = _primorial(_ALPHA)  # ~9.1k-bit constant, computed once


def correct_key_challenges(n: int) -> list[int]:
    """rho_i for i < K — zk-paillier correct_key_ni.rs proof()/verify()."""
    key_length = n.bit_length()
    return [
        mask_generation(key_length, _sha256_bigints(n, _SALT_BN, i)) % n
        for i in range(CORRECT_KEY_K)
    ]


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
        ch = correct_key_challenges(n)
        for i in range(CORRECT_KEY_K):
            fr[b, i] = ch[i]
            fm[b, i] = minv
    # challenge axis K broadcasts against the ctx batch via a trailing axis
    sigma = n_ctx.expand(n_ctx.n_ints.ndim).pow(rho, m_exp, ebits_hint=n_ctx.bits)
    return CorrectKeyProofBatch(sigma=sigma)


def correct_key_verify(proof: CorrectKeyProofBatch, n_ctx: ModCtx) -> np.ndarray:
    """-> bool ndarray [...].  zk-paillier verify(): all K roots check AND
    gcd(N, primorial(<6370)) == 1.  Attacker-controlled sigma values wider
    than the modulus class are rejected up-front (False, never raise)."""
    shape = n_ctx.batch_shape
    rho = np.empty(shape + (CORRECT_KEY_K,), dtype=object)
    flat_n = n_ctx.n_ints.reshape(-1)
    fr = rho.reshape(-1, CORRECT_KEY_K)
    small_ok = np.ones(flat_n.shape[0], dtype=bool)
    for b in range(flat_n.shape[0]):
        n = int(flat_n[b])
        ch = correct_key_challenges(n)
        for i in range(CORRECT_KEY_K):
            fr[b, i] = ch[i]
        if math.gcd(n, ALPHA_PRIMORIAL) != 1:
            small_ok[b] = False
    sigma = np.asarray(proof.sigma, dtype=object)
    width_ok = np.ones(shape, dtype=bool)
    n_b = np.broadcast_to(n_ctx.n_ints, shape)
    for idx in np.ndindex(*shape):
        for i in range(CORRECT_KEY_K):
            s = int(sigma[idx + (i,)])
            if s < 0 or s >= int(n_b[idx]):
                width_ok[idx] = False
                sigma = sigma.copy()
                sigma[idx + (i,)] = 0
    exps = np.broadcast_to(
        n_ctx.n_ints[..., None], shape + (CORRECT_KEY_K,)
    )
    back = n_ctx.expand(n_ctx.n_ints.ndim).pow(sigma, exps, ebits_hint=n_ctx.bits)
    ok = np.all(back == rho, axis=-1)
    return ok & small_ok.reshape(shape) & width_ok


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
    # y is an attacker-controlled proof field: clamp before any device call
    # so an oversized value fails verification instead of raising in the
    # exponent-class ladder (ADVICE r1: never crash the verifier).
    y = np.asarray(proof.y, dtype=object)
    y_flat = y.reshape(-1) if y.shape else y.reshape(1)
    y_ok_flat = np.array(
        [0 <= int(v) < (1 << (_R_BITS + 300)) for v in y_flat.tolist()], dtype=bool
    )
    y_ok = y_ok_flat.reshape(y.shape)
    if not y_ok.all():
        y = y.copy().reshape(-1)
        y[~y_ok_flat] = 0
        y = y.reshape(y_ok.shape)
        proof = CompositeDLogProofBatch(u=proof.u, y=y)
    e = _cdlog_challenge(stmt, proof.u)
    g_y = stmt.ctx.pow(stmt.g, proof.y, ebits_hint=_R_BITS + 300)
    ni_e = stmt.ctx.pow(stmt.ni, e, ebits_hint=256)
    n = np.broadcast_to(stmt.ctx.n_ints, g_y.shape)
    flat = [np.asarray(a, dtype=object).reshape(-1) for a in (g_y, ni_e, n, proof.u)]
    out = np.empty(flat[0].shape[0], dtype=bool)
    for b in range(flat[0].shape[0]):
        out[b] = int(flat[0][b]) * int(flat[1][b]) % int(flat[2][b]) == int(flat[3][b])
    return out.reshape(g_y.shape) & np.broadcast_to(y_ok, g_y.shape)
