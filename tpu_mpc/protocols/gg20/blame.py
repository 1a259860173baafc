"""GG20 identifiable aborts — batched blame protocols.

Behavioral port of /root/reference/src/protocols/multi_party_ecdsa/gg_2020/
blame.rs: on a phase-5/6/7 failure, parties reveal the listed local state,
every MtA ciphertext is deterministically replayed, and the mismatching
slots become the bad-actor set (sorted, deduped — here a boolean [S, tp]
matrix plus per-session index lists).

The reference's (ind1, ind2) n x (n-1) transpositions (blame.rs:82-98,
190-196) disappear: the dense [S, alice, bob] matrices of the batched
protocol are already globally indexed, so "party i's beta against j" is
just beta[:, j, i].
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ...ec import secp256k1 as dec
from ...host import ec as hec, paillier as hp
from ...mta import mta
from ...utils.rng import SessionRng
from ...zk import sigma
from ..gg18.batch import _off_diag_sum, _sc
from .batch import LocalKeyBatch20, OfflineState

Q = hec.N


def _bad_lists(bad: np.ndarray) -> list[list[int]]:
    """[S, tp] bool -> per-session sorted bad-actor index lists."""
    return [sorted(int(j) for j in np.nonzero(row)[0]) for row in bad]


def phase5_blame(key: LocalKeyBatch20, off: OfflineState) -> list[list[int]]:
    """Replay of the gamma-path MtA (blame.rs:116-224).

    Uses the revealed LocalStatePhase5 fields carried in OfflineState:
    k, k_randomness, gamma, beta_randomness, beta_tag.
    """
    S = key.S
    tp = len(off.s_parties)
    eye = np.eye(tp, dtype=bool)[None]
    ek_s = key.ek.take(off.s_parties, 1)

    # 1. decommit re-check (blame.rs:126-141): the revealed gamma_i must
    # reproduce the phase-4 decommitted g_gamma_i — catches a party that
    # committed/decommitted to a fake point while using the real gamma in
    # the MtA (or lies about gamma in the reveal).
    bad = np.zeros((S, tp), dtype=bool)
    if off.g_gamma_decommit is not None:
        g_gamma_rec = dec.mul_generator(_sc(np.mod(off.gamma, Q)))
        bad |= ~np.asarray(dec.point_eq(g_gamma_rec, off.g_gamma_decommit))

    # 2. check message A: re-encrypt k with revealed randomness (possibly a
    # deferred randomizer-table handle — resolve materializes it)
    from ...core.modctx import resolve as _res0

    c_a_replay = mta.paillier_encrypt_ints(
        ek_s, np.mod(off.k, Q), _res0(off.k_randomness)
    )
    bad |= c_a_replay != off.msg_a_c

    # 3. replay message B matrix
    c_a_pairs = np.broadcast_to(off.msg_a_c[:, :, None], (S, tp, tp))
    ek_pairs = ek_s.expand(2)
    from ...core.modctx import resolve as _resolve

    # beta_randomness may be a deferred handle (randomizer-table sampling
    # defers the r value's launch until a blame actually needs it)
    c_beta_tag = mta.paillier_encrypt_ints(
        ek_pairs, off.beta_tag, _resolve(off.beta_randomness)
    )
    b_ca = ek_pairs.nn_ctx.pow(c_a_pairs, np.mod(off.gamma[:, None, :], Q), 256)
    from ...zk.range_proofs import _mulmod

    c_b_replay = _mulmod(b_ca, c_beta_tag, np.broadcast_to(ek_pairs.nn, (S, tp, tp)))
    b_mismatch = np.where(eye, False, c_b_replay != off.msg_b_gamma_c)
    # mismatch in (i alice, j bob) blames bob j (blame.rs:155-157)
    bad |= b_mismatch.any(axis=1)

    # 4. reconstruct deltas from revealed values
    beta = np.mod(-np.mod(off.beta_tag, Q), Q)
    # alpha_ij = k_i gamma_j - beta_ij (blame.rs:159-160)
    alpha = np.mod(np.mod(off.k[:, :, None] * off.gamma[:, None, :], Q) - beta, Q)
    kg = np.mod(off.k * off.gamma, Q)
    delta_rec = np.mod(kg + _off_diag_sum(alpha, 2) + _off_diag_sum(beta, 1), Q)
    bad |= delta_rec != np.mod(off.delta_i, Q)

    return _bad_lists(bad)


def phase6_local_proofs(off: OfflineState, rng: SessionRng):
    """The ECDDH proof each ACCUSED party produces from its local state for
    the statement (G, R; sigma_i G + ..., S_i) — the per-party inputs the
    judge-side phase6_blame consumes (GlobalStatePhase6, blame.rs:258-271).
    """
    S = off.k.shape[0]
    tp = len(off.s_parties)
    return sigma.ecddh_prove(
        _sc(off.sigma_i), dec.generator((S, tp)), dec.point_expand(off.R, 1), rng
    )


def phase6_blame(
    key: LocalKeyBatch20, off: OfflineState, rng: SessionRng,
    ecddh_proofs=None,
) -> list[list[int]]:
    """Replay of the w-path MtAwc + ECDDH consistency (blame.rs:322-421).

    ecddh_proofs: the per-party proofs revealed by the accused parties
    (phase6_local_proofs).  They are INPUTS here — a forged proof (e.g. a
    party whose S_i does not encode its true sigma_i) fails verification
    and blames its producer (blame.rs:396-414).  If omitted, honest local
    proofs are generated in-process (the all-honest-reveal transcript).
    """
    S = key.S
    tp = len(off.s_parties)
    eye = np.eye(tp, dtype=bool)[None]
    ek_s = key.ek.take(off.s_parties, 1)
    ek_pairs = ek_s.expand(2)
    bad = np.zeros((S, tp), dtype=bool)

    # extract miu randomness via Paillier::open (host; blame.rs:252-256)
    p_s = key.p[:, off.s_parties]
    q_s = key.q[:, off.s_parties]
    miu_rand = np.empty((S, tp, tp), dtype=object)
    for s in range(S):
        for i in range(tp):
            dk = hp.DecryptionKey(int(p_s[s, i]), int(q_s[s, i]))
            for j in range(tp):
                if i == j:
                    miu_rand[s, i, j] = 1
                    continue
                _, r = hp.open(dk, int(off.m_b_w_c[s, i, j]))
                miu_rand[s, i, j] = r

    # 1. re-encrypt miu (raw, pre-reduction) with extracted randomness
    c_replay = mta.paillier_encrypt_ints(ek_pairs, off.miu, miu_rand)
    bad |= np.where(eye, False, c_replay != off.m_b_w_c).any(axis=2)

    # 2. re-encrypt k
    from ...core.modctx import resolve as _res6

    c_a_replay = mta.paillier_encrypt_ints(
        ek_s, np.mod(off.k, Q), _res6(off.k_randomness)
    )
    bad |= c_a_replay != off.msg_a_c

    # 3. reconstruct g_sigma_i and check the ECDDH proofs
    from ...vss import feldman

    lam = np.asarray(
        [feldman.lagrange_coeff(i, off.s_parties) for i in off.s_parties], dtype=object
    )
    w = np.mod(key.x[:, off.s_parties] * lam[None, :], Q)
    g_w = dec.mul_generator(_sc(w))

    # g_ni[i, j] = k_i g_w_j - miu_ij G (blame.rs:358-373)
    gw_pairs = dec.point_expand(g_w, 1)                      # [S, 1, tp]
    k_pairs = _sc(np.mod(np.broadcast_to(off.k[:, :, None], (S, tp, tp)), Q))
    g_w_k = dec.scalar_mul(k_pairs, gw_pairs)                # [S, i, j]
    g_miu = dec.mul_generator(_sc(np.mod(off.miu, Q)))
    g_ni = dec.point_add(g_w_k, dec.point_neg(g_miu))

    # g_sigma_i = k_i g_w_i + sum_j miu_ij G + sum_j g_ni[j, i] (blame.rs:377-394)
    g_wi_ki = dec.scalar_mul(_sc(np.mod(off.k, Q)), g_w)
    miu_masked = np.where(eye, 0, np.mod(off.miu, Q))
    miu_sum = np.mod(np.sum(miu_masked, axis=2), Q)
    g_sigma = dec.point_add(g_wi_ki, dec.mul_generator(_sc(miu_sum)))
    # add sum over j != i of g_ni[j, i]: mask diagonal by adding infinity
    inf = dec.point_infinity((S, tp, tp))
    eye_dev = np.broadcast_to(np.eye(tp, dtype=bool)[None], (S, tp, tp))
    import jax.numpy as jnp

    g_ni_masked = dec.Point(
        jnp.where(jnp.asarray(eye_dev)[..., None], inf.X, g_ni.X),
        jnp.where(jnp.asarray(eye_dev)[..., None], inf.Y, g_ni.Y),
        jnp.where(jnp.asarray(eye_dev)[..., None], inf.Z, g_ni.Z),
    )
    g_ni_sum = dec.point_sum(g_ni_masked, axis=1)            # sum over alice j -> [S, i]
    g_sigma = dec.point_add(g_sigma, g_ni_sum)

    # ECDDH proofs: statement (g1=G, g2=R, h1=g_sigma_i, h2=S_i)
    if ecddh_proofs is None:
        ecddh_proofs = phase6_local_proofs(off, rng)
    ok = sigma.ecddh_verify(
        ecddh_proofs, dec.generator((S, tp)), g_sigma,
        dec.point_expand(off.R, 1), off.S_i,
    )
    bad |= ~ok
    return _bad_lists(bad)


def phase7_blame(off: OfflineState, s_i: np.ndarray, m_int) -> list[list[int]]:
    """s_i R == m R_bar_i + r S_i per party (blame.rs:433-455)."""
    S = s_i.shape[0]
    tp = s_i.shape[1]
    m_arr = np.mod(np.broadcast_to(np.asarray(m_int, dtype=object), (S, tp)), Q)
    lhs = dec.scalar_mul(_sc(np.mod(s_i, Q)), dec.point_expand(off.R, 1))
    rhs = dec.point_add(
        dec.scalar_mul(_sc(m_arr), off.R_bar),
        dec.scalar_mul(_sc(np.mod(np.broadcast_to(off.r_x[:, None], (S, tp)), Q)), off.S_i),
    )
    bad = ~np.asarray(dec.point_eq(lhs, rhs))
    return _bad_lists(bad)
