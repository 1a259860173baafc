"""GG18 {t,n}-threshold ECDSA, session-batched (the TPU-native formulation).

Behavioral port of /root/reference/src/protocols/multi_party_ecdsa/gg_2018/
party_i.rs: 4-round keygen + 5-phase signing with the 5A-5D commit/decommit
consistency dance.  The reference's per-party object graph becomes SoA
arrays [S(essions), n(parties), ...]; "messages" between parties are index
moves on those arrays (exactly the erasure the reference's own tests perform,
gg_2018/test.rs:57-161).  All heavy math runs as batched device kernels.

Range proofs: like the reference's test path (gg_2018/test.rs:194 passes
`&[]` dlog_statements), GG18 MtA runs without range proofs; GG20 adds them.

Every verification step yields a per-slot boolean mask; `KeygenResult.ok` /
`SignResult.ok` aggregate them (sessions with a False slot correspond to the
reference's Err(InvalidKey/InvalidSS/InvalidCom/...)).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax.numpy as jnp

from ...core.limbs import batch_from_limbs
from ...ec import secp256k1 as dec
from ...hashes.fiat_shamir import commit_rows, digest_rows, point_hash_ints
from ...host import ec as hec, primes
from ...mta import mta
from ...paillier import paillier as dp
from ...utils.rng import SessionRng
from ...vss import feldman
from ...zk import sigma
from ...zk.paillier_zk import CorrectKeyProofBatch, correct_key_prove, correct_key_verify
from ...zk.range_proofs import PaillierCtxBatch

Q = hec.N
SECURITY = 256  # blinding bits, gg_2018/party_i.rs:42


def _sc(x):
    return dec.sc_from_ints(np.asarray(x, dtype=object))


def gen_paillier_batch(S: int, n: int, bits: int, rng: SessionRng, safe: bool = False):
    """Host-side Paillier keygen for every (session, party) slot —
    prime search parallelized across cores (seed order matches the old
    per-slot p,q loop, so generated keys are unchanged).  safe=True draws
    safe primes p = 2p'+1 (Paillier::keypair_safe_primes role,
    gg_2018/party_i.rs:163-175 Keys::create_safe_prime)."""
    gen = primes.gen_safe_primes_parallel if safe else primes.gen_primes_parallel
    flat = gen(bits // 2, 2 * S * n, rng._r)
    ps = np.asarray(flat[0::2], dtype=object).reshape(S, n)
    qs = np.asarray(flat[1::2], dtype=object).reshape(S, n)
    return ps, qs


@dataclasses.dataclass
class LocalKeyBatch:
    """The long-lived keygen output (reference LocalKey / PartyPrivate)."""

    S: int
    t: int
    n: int
    paillier_bits: int
    p: np.ndarray             # [S, n] Paillier prime factors (secret)
    q: np.ndarray
    ek: PaillierCtxBatch      # [S, n]
    dk: dp.BatchDecryptionKey  # [S, n]
    u: np.ndarray             # [S, n] additive key shares (secret)
    x: np.ndarray             # [S, n] VSS-aggregated shares (secret)
    y: dec.Point              # [S]   shared public key
    y_i: dec.Point            # [S, n] per-party public commitments u_i G
    vss: feldman.VssSchemeBatch  # aggregated? per-dealer commitments [S, n, t+1]


@dataclasses.dataclass
class KeygenResult:
    key: LocalKeyBatch
    ok: np.ndarray            # [S] all checks passed
    bad_actors: np.ndarray    # [S, n] per-party failure flags


def keygen(
    S: int, t: int, n: int, rng: SessionRng, paillier_bits: int = 2048,
    safe_primes: bool = False,
) -> KeygenResult:
    """4-round GG18 keygen over a batch of S sessions (party_i.rs:148-311).
    safe_primes=True is Keys::create_safe_prime (party_i.rs:163-175)."""
    # --- round 0: per-party secrets -------------------------------------
    u = rng.scalars((S, n))
    y_i = dec.mul_generator(_sc(u))
    p_fac, q_fac = gen_paillier_batch(S, n, paillier_bits, rng, safe=safe_primes)
    ns = p_fac * q_fac
    ek = PaillierCtxBatch.from_ints(ns, paillier_bits).attach_sk(p_fac, q_fac)
    dk = dp.BatchDecryptionKey.from_ints(p_fac, q_fac, paillier_bits)

    # --- round 1: broadcast com(y_i) + Paillier correct-key proof --------
    blind = rng.bits(SECURITY, (S, n))
    y_ints = point_hash_ints(y_i)
    com = commit_rows(y_ints, blind)
    phis = (p_fac - 1) * (q_fac - 1)
    ck_proof = correct_key_prove(ek.n_ctx, phis)

    # --- round 2: decommit + verify; VSS share --------------------------
    com_ok = commit_rows(y_ints, blind) == com       # decommit check (all True in honest runs)
    ck_ok = correct_key_verify(ck_proof, ek.n_ctx)   # [S, n]
    vss, shares = feldman.share(t, n, u, rng)        # shares [S, n_dealer, n_recv]

    # --- round 3: validate shares, build x_i, dlog proofs ----------------
    vss_ok = np.ones((S, n), dtype=bool)
    for j in range(n):
        okj = feldman.validate_share(vss, shares[:, :, j], j)  # [S, n_dealer]
        vss_ok &= okj
    # commitments[0] == y_i
    c0 = feldman.point_index(vss.commitments, 0)
    c0_ok = np.asarray(dec.point_eq(c0, y_i))
    x = np.mod(np.sum(shares, axis=1), Q)            # x_j = sum_i share_{i->j}, [S, n_recv]
    y = dec.point_sum(y_i, axis=1)                   # [S]
    dlog_proofs = sigma.dlog_prove(_sc(x), rng)

    # --- round 4: verify dlog proofs ------------------------------------
    dlog_ok = sigma.dlog_verify(dlog_proofs)         # [S, n]

    bad = ~(com_ok & ck_ok & vss_ok & c0_ok & dlog_ok)
    key = LocalKeyBatch(
        S=S, t=t, n=n, paillier_bits=paillier_bits,
        p=p_fac, q=q_fac, ek=ek, dk=dk, u=u, x=x, y=y, y_i=y_i, vss=vss,
    )
    return KeygenResult(key=key, ok=~bad.any(axis=1), bad_actors=bad)


@dataclasses.dataclass
class SignResult:
    r: np.ndarray             # [S] ints
    s: np.ndarray             # [S] ints
    recid: np.ndarray         # [S] 0..3
    ok: np.ndarray            # [S] protocol checks all passed
    sig_valid: np.ndarray     # [S] independent ECDSA verification


def _off_diag_sum(m: np.ndarray, axis: int) -> np.ndarray:
    """Sum over `axis` of a [..., t, t] pair matrix, excluding the diagonal."""
    tt = m.shape[-1]
    eye = np.eye(tt, dtype=bool)
    masked = np.where(eye, 0, m)
    return np.sum(masked, axis=axis)


def sign(key: LocalKeyBatch, s_parties: list[int], m_int, rng: SessionRng) -> SignResult:
    """GG18 signing among signer subset s_parties (0-based), batched.

    Phases follow gg_2018/party_i.rs:384-711; MtA without range proofs
    (the reference test path).
    """
    S = key.S
    tp = len(s_parties)
    assert tp >= key.t + 1, "need at least t+1 signers"
    m_arr = np.asarray(
        np.broadcast_to(np.asarray(m_int, dtype=object), (S,)), dtype=object
    )

    # SignKeys::create — w_i = lambda_i * x_i (party_i.rs:384-406)
    lam = np.asarray([feldman.lagrange_coeff(i, s_parties) for i in s_parties], dtype=object)
    x_s = key.x[:, s_parties]
    w = np.mod(x_s * lam[None, :], Q)                 # [S, tp]
    g_w = dec.mul_generator(_sc(w))
    k = rng.scalars((S, tp))
    gamma = rng.scalars((S, tp))
    g_gamma = dec.mul_generator(_sc(gamma))

    # phase 1: commit to g_gamma_i (party_i.rs:408-424)
    blind1 = rng.bits(SECURITY, (S, tp))
    gg_ints = point_hash_ints(g_gamma)  # reused at the decommit check
    com1 = commit_rows(gg_ints, blind1)

    # MtA pairs, off-diagonal PACKED [S, alice, tp-1] (see gg20 _peer_idx):
    # the dense eye-masked [S, tp, tp] layout wasted a diagonal of device
    # compute on every MtA launch
    from ..gg20.batch import _peer_idx

    peers, iinv = _peer_idx(tp)
    kidx = np.broadcast_to(np.arange(tp - 1), (tp, tp - 1))
    pshape = (S, tp, tp - 1)
    ek_s = key.ek.take(s_parties, 1)                  # [S, tp]
    ek_pairs = ek_s.expand(2)                         # [S, tp, 1]
    r_a = rng.below(np.broadcast_to(ek_s.n, (S, tp)), (S, tp))
    msg_a = mta.message_a(k, ek_s, r_a, None, rng)    # c_a [S, tp]

    c_a_pairs = np.broadcast_to(msg_a.c[:, :, None], pshape)
    gamma_b = gamma[:, peers]                         # bob j's secret per slot
    w_b = w[:, peers]

    msg_b_gamma, beta_g, _, _, _ = mta.message_b(gamma_b, ek_pairs, c_a_pairs, None, None, rng)
    msg_b_w, beta_w, _, _, _ = mta.message_b(w_b, ek_pairs, c_a_pairs, None, None, rng)

    # alice decrypts: alpha (gamma path), mu (w path)  [S, alice, tp-1]
    dk_s = mta.expand_tree_axis(
        _dk_take(key.dk, s_parties, 1), 2
    )
    a_pairs = np.broadcast_to(k[:, :, None], pshape)
    alpha, _, ok_a = mta.verify_proofs_get_alpha(dk_s, msg_b_gamma, a_pairs, pshape)
    mu, _, ok_m = mta.verify_proofs_get_alpha(dk_s, msg_b_w, a_pairs, pshape)
    mta_ok = (ok_a & ok_m).all(axis=(1, 2))

    # phase 2: delta_i, sigma_i (party_i.rs:426-444)
    kg = np.mod(k * gamma, Q)
    kw = np.mod(k * w, Q)
    delta_i = np.mod(kg + np.sum(alpha, axis=2) + np.sum(beta_g[:, iinv, kidx], axis=2), Q)
    sigma_i = np.mod(kw + np.sum(mu, axis=2) + np.sum(beta_w[:, iinv, kidx], axis=2), Q)

    # phase 3: delta = sum, invert (party_i.rs:446-452)
    delta = np.mod(np.sum(delta_i, axis=1), Q)
    delta_inv = np.asarray([pow(int(d), -1, Q) for d in delta], dtype=object)

    # phase 4: decommit g_gamma, check b_proofs, R (party_i.rs:454-483)
    com_ok = (commit_rows(gg_ints, blind1) == com1).all(axis=1)
    # b_proof pk (bob j's gamma) must equal decommitted g_gamma_j
    bp_pk = msg_b_gamma.b_proof.pk                   # [S, alice, tp-1] points
    gg_peers = dec.point_take(g_gamma, peers, 1)
    pk_ok = np.asarray(dec.point_eq(bp_pk, gg_peers)).all(axis=(1, 2))
    gamma_sum = dec.point_sum(g_gamma, axis=1)       # [S]
    R = dec.scalar_mul(_sc(delta_inv), gamma_sum)
    r_x = batch_from_limbs(np.asarray(dec.x_coord_mod_q(R)))  # [S] ints

    # phase 5 local sig: s_i = m k_i + r sigma_i (party_i.rs:487-511)
    s_i = np.mod(np.mod(m_arr, Q)[:, None] * k + r_x[:, None] * sigma_i, Q)

    # --- phase 5A: V, A, B + com (party_i.rs:513-559) -------------------
    l_i = rng.scalars((S, tp))
    rho_i = rng.scalars((S, tp))
    R_pairs = dec.point_expand(R, 1)                 # [S, 1]
    V_i = dec.point_add(dec.scalar_mul(_sc(s_i), R_pairs), dec.mul_generator(_sc(l_i)))
    A_i = dec.mul_generator(_sc(rho_i))
    B_i = dec.mul_generator(_sc(np.mod(l_i * rho_i, Q)))
    blind5a = rng.bits(SECURITY, (S, tp))
    input_hash5a = digest_rows(point_hash_ints(V_i), point_hash_ints(A_i), point_hash_ints(B_i))
    com5a = commit_rows(input_hash5a, blind5a)
    # HomoElGamal: G=A_i, H=R, Y=g, D=V_i, E=B_i; witness x=s_i, r=l_i
    heg = sigma.homo_elgamal_prove(
        _sc(s_i), _sc(l_i), A_i, R_pairs, dec.generator((S, tp)), V_i, B_i, rng
    )
    dlog_rho = sigma.dlog_prove(_sc(rho_i), rng)

    # --- phase 5B/5C: verify + u_i, t_i (party_i.rs:561-636) ------------
    com5a_ok = (commit_rows(input_hash5a, blind5a) == com5a).all(axis=1)
    heg_ok = sigma.homo_elgamal_verify(
        heg, A_i, R_pairs, dec.generator((S, tp)), V_i, B_i
    ).all(axis=1)
    rho_ok = sigma.dlog_verify(dlog_rho).all(axis=1)

    v_sum = dec.point_sum(V_i, axis=1)               # [S]
    a_sum = dec.point_sum(A_i, axis=1)
    # v = V_sum - m G - r y   (v includes own V_i, party_i.rs:594-597)
    m_g = dec.mul_generator(_sc(np.mod(m_arr, Q)))
    r_y = dec.scalar_mul(_sc(r_x), key.y)
    v = dec.point_add(v_sum, dec.point_neg(dec.point_add(m_g, r_y)))
    u_i = dec.scalar_mul(_sc(rho_i), dec.point_expand(v, 1))
    # a EXCLUDES the party's own A_i (party_i.rs:595,599 iterates only the
    # received decommits): t_i = l_i * (sum_j A_j - A_i)
    a_minus_own = dec.point_add(dec.point_expand(a_sum, 1), dec.point_neg(A_i))
    t_i = dec.scalar_mul(_sc(l_i), a_minus_own)
    blind5c = rng.bits(SECURITY, (S, tp))
    input_hash5c = digest_rows(point_hash_ints(u_i), point_hash_ints(t_i))
    com5c = commit_rows(input_hash5c, blind5c)

    # --- phase 5D: sum check (party_i.rs:638-673) -----------------------
    com5c_ok = (commit_rows(input_hash5c, blind5c) == com5c).all(axis=1)
    t_plus_b = dec.point_sum(dec.point_add(t_i, B_i), axis=1)
    u_sum = dec.point_sum(u_i, axis=1)
    sum_ok = np.asarray(dec.point_eq(t_plus_b, u_sum))

    # --- output signature (party_i.rs:674-711) --------------------------
    s_sum = np.mod(np.sum(s_i, axis=1), Q)
    _, ry_l, _ = dec.to_affine(R)
    ry = batch_from_limbs(np.asarray(ry_l))
    # reference tests R.y mod q for oddness (party_i.rs:689-698)
    recid = np.asarray([(int(v) % Q) & 1 for v in ry], dtype=object)
    s_final = np.empty(S, dtype=object)
    for b in range(S):
        sv = int(s_sum[b])
        rec = int(recid[b])
        if sv > Q - sv:
            sv = Q - sv
            rec ^= 1
        s_final[b] = sv
        recid[b] = rec
    # independent verification: OpenSSL secp256k1 oracle (libsecp check_sig
    # role of gg_2020/test.rs:711-748)
    y_host = dec.points_to_host(key.y)
    sig_valid = np.asarray(
        hec.ecdsa_verify_batch(y_host, np.mod(m_arr, Q), r_x, s_final)
    )
    ok = mta_ok & com_ok & pk_ok & com5a_ok & heg_ok & rho_ok & com5c_ok & sum_ok
    return SignResult(r=r_x, s=s_final, recid=recid, ok=np.asarray(ok), sig_valid=sig_valid)


def _dk_take(dk: dp.BatchDecryptionKey, indices, axis: int) -> dp.BatchDecryptionKey:
    import jax

    idx = jnp.asarray(indices)
    return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=axis), dk)


def refresh_private_key(key: LocalKeyBatch, factor_ints, rng: SessionRng) -> LocalKeyBatch:
    """Key rotation: u_i += factor, fresh Paillier keypair per slot
    (gg_2018/party_i.rs:326-358 refresh_private_key).

    factor_ints: [S, n] additive factors (a proactive refresh ceremony
    supplies zero-sum factors so y is invariant; this function applies
    whatever it is given, like the reference).
    """
    S, n, bits = key.S, key.n, key.paillier_bits
    factor = np.mod(np.asarray(factor_ints, dtype=object), Q)
    u_new = np.mod(key.u + factor, Q)
    y_i_new = dec.mul_generator(_sc(u_new))
    p_fac, q_fac = gen_paillier_batch(S, n, bits, rng)
    ns = p_fac * q_fac
    return dataclasses.replace(
        key,
        u=u_new,
        y_i=y_i_new,
        y=dec.point_sum(y_i_new, axis=1),
        p=p_fac,
        q=q_fac,
        ek=PaillierCtxBatch.from_ints(ns, bits).attach_sk(p_fac, q_fac),
        dk=dp.BatchDecryptionKey.from_ints(p_fac, q_fac, bits),
    )


def update_private_key(key: LocalKeyBatch, factor_u, factor_x) -> LocalKeyBatch:
    """PartyPrivate::update_private_key (gg_2018/party_i.rs:371-381):
    additive update of u_i and x_i (Paillier keys untouched)."""
    u_new = np.mod(key.u + np.asarray(factor_u, dtype=object), Q)
    x_new = np.mod(key.x + np.asarray(factor_x, dtype=object), Q)
    y_i_new = dec.mul_generator(_sc(u_new))
    return dataclasses.replace(
        key, u=u_new, x=x_new, y_i=y_i_new, y=dec.point_sum(y_i_new, axis=1)
    )


def to_encrypted_segments(
    key: LocalKeyBatch, segment_size: int, num_segments: int, pub_y, rng: SessionRng
):
    """Verifiable backup of every u_i share (gg_2018/party_i.rs:360-369):
    -> (witnesses, encrypted segment lists), flattened [S * n] row-major."""
    from ...host import backup

    return backup.backup_batch(key.u, segment_size, num_segments, pub_y, rng)
