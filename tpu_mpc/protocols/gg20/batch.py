"""GG20 {t,n}-threshold ECDSA with identifiable aborts, session-batched.

Behavioral port of /root/reference/src/protocols/multi_party_ecdsa/gg_2020/
party_i.rs (936 LoC) in the SoA [S, n, ...] formulation:

  keygen   4 rounds: + ring-Pedersen setup (h1, h2, N_tilde), correct-key
           proof, composite-dlog proofs both directions, Paillier bit-length
           policing (party_i.rs:49-50, 287-290)
  offline  6 rounds: MtA with Alice range proofs, T_i Pedersen commitments
           (phase 3), R / R_bar + PDLwSlack (phases 4-5), S_i + HomoElGamal
           consistency (phase 6)
  online   1 round: s_i broadcast (phase 7)

Per-check boolean masks feed bad-actor accumulation exactly like the
reference's ErrorType { error_type, bad_actors } (gg_2020/mod.rs:23-27);
the blame module (blame.py) consumes the same state for identifiable aborts.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ...core.limbs import batch_from_limbs
from ...core.modctx import ModCtx
from ...ec import secp256k1 as dec
from ...hashes.fiat_shamir import commit_rows, digest_rows, point_hash_ints
from ...host import ec as hec, primes
from ...mta import mta
from ...paillier import paillier as dp
from ...utils.rng import SessionRng
from ...vss import feldman
from ...zk import sigma
from ...zk.paillier_zk import (
    CompositeDLogStatementBatch,
    composite_dlog_prove,
    composite_dlog_verify,
    correct_key_prove,
    correct_key_verify,
)
from ...zk.pdl_slack import (
    PDLwSlackProofBatch,
    PDLwSlackStatementBatch,
    pdl_slack_prove,
)
from ...zk.range_proofs import DlogStatementBatch, PaillierCtxBatch
from ..gg18.batch import _dk_take, _sc, gen_paillier_batch

Q = hec.N
SECURITY = 256
PAILLIER_MIN_BITS = 2047  # party_i.rs:49
PAILLIER_MAX_BITS = 2048  # party_i.rs:50


def generate_h1_h2_n_tilde_batch(S: int, n: int, bits: int, rng: SessionRng):
    """Ring-Pedersen setup per slot (party_i.rs:137-156), host-side primes +
    batched device modexp for h2 = h1^xhi mod N_tilde."""
    pt, qt = gen_paillier_batch(S, n, bits, rng)
    n_tilde = pt * qt
    phi = (pt - 1) * (qt - 1)
    h1 = rng.below(n_tilde, (S, n))
    xhi0 = np.empty((S, n), dtype=object)
    xhi_inv0 = np.empty((S, n), dtype=object)
    for s in range(S):
        for i in range(n):
            ph = int(phi[s, i])
            while True:
                x = rng._r.randrange(ph)
                try:
                    inv = pow(x, -1, ph)
                    break
                except ValueError:
                    continue
            xhi0[s, i] = x
            xhi_inv0[s, i] = inv
    ctx = ModCtx.from_ints(n_tilde, bits)
    h2 = ctx.pow(h1, xhi0, bits)
    xhi = phi - xhi0          # party_i.rs:152-153
    xhi_inv = phi - xhi_inv0
    return ctx, h1, h2, xhi, xhi_inv, phi


@dataclasses.dataclass
class LocalKeyBatch20:
    S: int
    t: int
    n: int
    paillier_bits: int
    p: np.ndarray
    q: np.ndarray
    ek: PaillierCtxBatch          # [S, n]
    dk: dp.BatchDecryptionKey
    dlog_stmt: DlogStatementBatch  # [S, n] (h1, h2, N_tilde per party)
    u: np.ndarray
    x: np.ndarray
    y: dec.Point
    y_i: dec.Point
    vss: feldman.VssSchemeBatch


@dataclasses.dataclass
class KeygenResult20:
    key: LocalKeyBatch20
    ok: np.ndarray
    bad_actors: np.ndarray


def keygen(
    S: int, t: int, n: int, rng: SessionRng, paillier_bits: int = 2048,
    corrupt: dict | None = None, safe_primes: bool = False,
) -> KeygenResult20:
    """safe_primes=True draws the Paillier factors as safe primes
    (Keys::create_safe_prime, gg_2020/party_i.rs:180-196); the ring-Pedersen
    N_tilde stays on random primes either way, exactly like the reference's
    generate_h1_h2_N_tilde (party_i.rs:137-140 — its safe-prime call is
    commented out there too)."""
    u = rng.scalars((S, n))
    y_i = dec.mul_generator(_sc(u))
    p_fac, q_fac = gen_paillier_batch(S, n, paillier_bits, rng, safe=safe_primes)
    if corrupt and corrupt.get("small_paillier"):
        # fault injection: a party presents an undersized Paillier modulus —
        # its proofs are honest for that key, so ONLY the bit-length policy
        # must catch it (test_small_paillier, gg_2020/test.rs:764-783)
        for pi in corrupt["small_paillier"]:
            for s in range(S):
                p_fac[s, pi] = primes.gen_prime(paillier_bits // 4, rng._r)
                q_fac[s, pi] = primes.gen_prime(paillier_bits // 4, rng._r)
    ns = p_fac * q_fac
    ek = PaillierCtxBatch.from_ints(ns, paillier_bits).attach_sk(p_fac, q_fac)
    dk = dp.BatchDecryptionKey.from_ints(p_fac, q_fac, paillier_bits)
    nt_ctx, h1, h2, xhi, xhi_inv, _phi_t = generate_h1_h2_n_tilde_batch(S, n, paillier_bits, rng)
    dlog_stmt = DlogStatementBatch(ctx=nt_ctx, h1=h1, h2=h2)

    # round 1 broadcast: com(y_i), correct-key, composite-dlog x2
    blind = rng.bits(SECURITY, (S, n))
    y_ints = point_hash_ints(y_i)
    com = commit_rows(y_ints, blind)
    phis = (p_fac - 1) * (q_fac - 1)
    ck_proof = correct_key_prove(ek.n_ctx, phis)
    stmt_h1 = CompositeDLogStatementBatch(ctx=nt_ctx, g=h1, ni=h2)
    stmt_h2 = CompositeDLogStatementBatch(ctx=nt_ctx, g=h2, ni=h1)
    cd_proof_h1 = composite_dlog_prove(stmt_h1, xhi, rng)
    cd_proof_h2 = composite_dlog_prove(stmt_h2, xhi_inv, rng)

    # round 2: verify everything (party_i.rs:260-320)
    com_ok = commit_rows(y_ints, blind) == com
    ck_ok = correct_key_verify(ck_proof, ek.n_ctx)
    cd_ok = composite_dlog_verify(cd_proof_h1, stmt_h1) & composite_dlog_verify(cd_proof_h2, stmt_h2)
    min_b, max_b = (
        (PAILLIER_MIN_BITS, PAILLIER_MAX_BITS)
        if paillier_bits == 2048
        else (paillier_bits - 1, paillier_bits)
    )
    bitlen_ok = np.vectorize(
        lambda v: min_b <= int(v).bit_length() <= max_b, otypes=[bool]
    )(ns) & np.vectorize(
        lambda v: min_b <= int(v).bit_length() <= max_b, otypes=[bool]
    )(nt_ctx.n_ints)

    vss, shares = feldman.share(t, n, u, rng)

    # round 3: share validation, x_i, dlog proof
    vss_ok = np.ones((S, n), dtype=bool)
    for j in range(n):
        vss_ok &= feldman.validate_share(vss, shares[:, :, j], j)
    c0_ok = np.asarray(dec.point_eq(feldman.point_index(vss.commitments, 0), y_i))
    x = np.mod(np.sum(shares, axis=1), Q)
    y = dec.point_sum(y_i, axis=1)
    dlog_proofs = sigma.dlog_prove(_sc(x), rng)

    # round 4: verify dlog proofs + against VSS commitment sums
    dlog_ok = sigma.dlog_verify(dlog_proofs)
    # xi_commitments: sum over dealers of commitment_eval at each index
    xi_ok = np.ones((S, n), dtype=bool)
    for j in range(n):
        cj = feldman.commitment_eval(vss, j)          # [S, n_dealer]
        xi_com = dec.point_sum(cj, axis=1)            # [S]
        pk_j = dec.Point(
            dlog_proofs.pk.X[:, j], dlog_proofs.pk.Y[:, j], dlog_proofs.pk.Z[:, j]
        )
        xi_ok[:, j] = np.asarray(dec.point_eq(xi_com, pk_j))

    bad = ~(com_ok & ck_ok & cd_ok & bitlen_ok & vss_ok & c0_ok & dlog_ok & xi_ok)
    # precompute the h1/h2 fixed-base tables while the statement batch is
    # still small (pre-tiling): every ring-Pedersen op in later signing then
    # runs squaring-free (range_proofs.rs:58-67 pattern, done once per key).
    # Likewise the Paillier randomizer-base tables (env-gated; THREAT_MODEL §7).
    dlog_stmt.ensure_tables()
    ek.ensure_enc_tables()
    key = LocalKeyBatch20(
        S=S, t=t, n=n, paillier_bits=paillier_bits,
        p=p_fac, q=q_fac, ek=ek, dk=dk, dlog_stmt=dlog_stmt,
        u=u, x=x, y=y, y_i=y_i, vss=vss,
    )
    return KeygenResult20(key=key, ok=~bad.any(axis=1), bad_actors=bad)


def _peer_idx(tp: int):
    """Rotation packing for the off-diagonal pair layout: slot (i, kk) is
    the pair (alice i, bob peers[i, kk] = (i+1+kk) mod tp).  iinv is the
    inverse map: peers[iinv[j, kk], kk] == j, so `a[:, iinv, kidx]` gathers
    the slots where party j is the bob."""
    peers = np.asarray([[(i + 1 + kk) % tp for kk in range(tp - 1)] for i in range(tp)])
    iinv = np.asarray([[(j - 1 - kk) % tp for kk in range(tp - 1)] for j in range(tp)])
    return peers, iinv


def _unpack_dense(packed: np.ndarray, peers: np.ndarray, fill) -> np.ndarray:
    """Packed [S, tp, tp-1] -> dense [S, alice, bob] with `fill` diagonal."""
    S_, tp = packed.shape[0], packed.shape[1]
    dense = np.full((S_, tp, tp), fill, dtype=object)
    for i in range(tp):
        for kk in range(tp - 1):
            dense[:, i, peers[i, kk]] = packed[:, i, kk]
    return dense


@dataclasses.dataclass
class OfflineState:
    """CompletedOfflineStage analog (sign.rs:647-655) + blame inputs."""

    s_parties: list[int]
    R: dec.Point                  # [S]
    r_x: np.ndarray               # [S]
    k: np.ndarray                 # [S, tp] (secret)
    sigma_i: np.ndarray           # [S, tp] (secret)
    delta_i: np.ndarray
    y: dec.Point
    ok: np.ndarray                # [S]
    bad_actors: np.ndarray        # [S, tp]
    # blame inputs (revealed only on abort)
    k_randomness: np.ndarray      # [S, tp]
    gamma: np.ndarray
    beta_g: np.ndarray            # [S, alice, bob]
    beta_randomness: np.ndarray
    beta_tag: np.ndarray
    alpha: np.ndarray
    msg_a_c: np.ndarray           # [S, tp] k ciphertexts
    msg_b_gamma_c: np.ndarray     # [S, alice, bob]
    R_bar: dec.Point              # [S, tp]
    S_i: dec.Point                # [S, tp]
    T_i: dec.Point
    l_i: np.ndarray
    m_b_w_c: np.ndarray = None
    miu: np.ndarray = None        # [S, alice, bob] raw (pre-mod-q) mu
    ni: np.ndarray = None         # beta of w path
    debug_masks: dict = None      # per-check masks (diagnostics)
    g_gamma_decommit: dec.Point = None  # phase-4 decommitted points (blame input)

    def scrub(self) -> None:
        """Zeroize the one-time secrets in place after the online round —
        the zeroize-on-drop analog (range_proofs.rs:26-27; the reference
        scrubs MtA round-1 state on drop).  The blame inputs are scrubbed
        too, so call only after a SUCCESSFUL sign; an aborted session needs
        them for the phase-5/6/7 blame replays."""
        from ...utils.ct import scrub_array

        scrub_array(
            self.k, self.sigma_i, self.delta_i, self.k_randomness, self.gamma,
            self.beta_g, self.beta_randomness, self.beta_tag, self.alpha,
            self.miu, self.ni, self.l_i,
        )


def _corrupt_slots(parties, S: int):
    """Yield (session index/slice, party slot) pairs for a corrupt spec:
    flat list = same slots in every session; list of lists = per-session."""
    if parties and isinstance(parties[0], (list, tuple)):
        for b, ps in enumerate(parties):
            for pi in ps:
                yield b, pi
    else:
        for pi in parties:
            yield slice(None), pi


def _double_mod_q(arr, b, pi):
    """arr[b, pi] := 2*arr[b, pi] mod Q for object arrays — scalar cells
    come back as bare python ints (np.mod on those overflows C long)."""
    v = arr[b, pi]
    if isinstance(v, np.ndarray):
        arr[b, pi] = np.mod(v * 2, Q)
    else:
        arr[b, pi] = (int(v) * 2) % int(Q)


def offline_stage(
    key: LocalKeyBatch20, s_parties: list[int], rng: SessionRng,
    corrupt: dict | None = None,
) -> OfflineState:
    """Rounds 0-6 of GG20 signing (message-independent offline phase).

    corrupt: optional {"step": 5|6, "parties": [slot indices]} fault
    injection — doubles delta_i / sigma_i like gg_2020/test.rs:459-465.
    `parties` may also be a per-session list of lists ([S][...]): session b
    then gets its own corrupted set — lets a test run a whole corruption
    matrix as ONE batched launch set (the sessions axis is the scenario
    axis, exactly the single-process multi-party pattern of SURVEY §4.1).
    """
    S = key.S
    tp = len(s_parties)
    # fixed-base h1/h2 tables: no-op if already built at keygen or if the
    # statement batch is too large (then pow_h1h2 falls back to pow_prod)
    key.dlog_stmt.ensure_tables()

    lam = np.asarray([feldman.lagrange_coeff(i, s_parties) for i in s_parties], dtype=object)
    x_s = key.x[:, s_parties]
    w = np.mod(x_s * lam[None, :], Q)
    g_w = dec.mul_generator(_sc(w))
    k = rng.scalars((S, tp))
    gamma = rng.scalars((S, tp))
    g_gamma = dec.mul_generator(_sc(gamma))
    # decommit-corruption seam (test.rs-style): a party commits AND decommits
    # consistently to a FAKE g_gamma (2 gamma G) while using the real gamma
    # in the MtA — only the phase-5 blame decommit re-check (blame.rs:126-141)
    # identifies it from the revealed state.
    if corrupt and corrupt.get("step") == "decommit":
        fake = gamma.copy()
        for pi in corrupt["parties"]:
            fake[:, pi] = np.mod(fake[:, pi] * 2, Q)
        g_gamma_dec = dec.mul_generator(_sc(fake))
    else:
        g_gamma_dec = g_gamma

    blind1 = rng.bits(SECURITY, (S, tp))
    gg_dec_ints = point_hash_ints(g_gamma_dec)  # reused at the decommit check
    com1 = commit_rows(gg_dec_ints, blind1)

    ek_s = key.ek.take(s_parties, 1)
    stmt_s = key.dlog_stmt.take(s_parties, 1)         # [S, tp]
    # MessageA: alice i encrypts k_i, proving range to each peer j's stmt;
    # randomizer tables (when built at keygen/load) supply (r_a, r_a^N)
    # squaring-free
    rn_a = r_a_t = None
    if ek_s.enc_tab_g is not None:
        # r_a itself stays a deferred launch: the proofs fold its table
        # exponent r_a_t instead, and only a blame replay materializes r_a
        r_a, rn_a, r_a_t = ek_s.sample_unit_with_power(
            (S, tp), rng, sync=False, defer_value=True, want_t=True
        )
    else:
        r_a = rng.below(np.broadcast_to(ek_s.n, (S, tp)), (S, tp))
    # Off-diagonal PACKED pair layout [S, alice, tp-1]: slot (i, kk) is the
    # pair (alice i, bob j = peers[i, kk]).  The dense eye-masked [S, tp, tp]
    # layout wasted a full diagonal of device compute on every MtA-layer
    # launch — 2x the useful work at the 2-of-3 production quorum.
    peers, iinv = _peer_idx(tp)
    kidx = np.broadcast_to(np.arange(tp - 1), (tp, tp - 1))
    stmt_peers = stmt_s.take(peers, 1)                # [S, alice, tp-1]
    ek_alice_pairs = ek_s.expand(2)                   # [S, tp, 1]
    from ...zk.range_proofs import alice_prove

    c_a = mta.paillier_encrypt_ints(ek_s, k, r_a, rn=rn_a)  # [S, tp] — one enc per alice
    alice_proofs = alice_prove(
        k[:, :, None], c_a[:, :, None], ek_alice_pairs, stmt_peers,
        None if r_a_t is not None else r_a[:, :, None], rng,
        r_t=None if r_a_t is None else r_a_t[:, :, None],
    )  # [S, alice, peer-slot]

    # MessageB (bob j responds to alice i): verify alice proof against own
    # stmt — the packed slot's statement IS bob's own (peers[i, kk] = j).
    # Both responder paths (gamma and w) ride ONE stacked [2, ...] call:
    # one randomizer launch, one c_a^b pow, one Enc product, stacked dlog
    # proofs — the kernels broadcast over the extra leading axis.
    pshape = (S, tp, tp - 1)
    c_a_pairs = np.broadcast_to(c_a[:, :, None], pshape)
    from ...zk.batch_verify import alice_verify_fast

    alice_ok = alice_verify_fast(alice_proofs, c_a_pairs, ek_alice_pairs, stmt_peers)
    b_stack = np.stack([gamma[:, peers], w[:, peers]])  # bob j's secrets
    msg_b2, beta2, beta_rand2, beta_tag2, _ = mta.message_b(
        b_stack, ek_alice_pairs, c_a_pairs, None, None, rng
    )
    beta_g, beta_w = beta2[0], beta2[1]
    beta_tag = beta_tag2[0]
    msg_b_gamma = mta.msg_b_index(msg_b2, 0)
    msg_b_w = mta.msg_b_index(msg_b2, 1)

    dk_s = mta.expand_tree_axis(_dk_take(key.dk, s_parties, 1), 2)
    a_pairs = np.broadcast_to(k[:, :, None], pshape)
    # both paths' decrypts + proof checks in one stacked pass too
    alpha2, alpha_raw2, ok2 = mta.verify_proofs_get_alpha(
        dk_s, msg_b2, a_pairs[None], (2,) + pshape, ek_sk=ek_alice_pairs
    )
    alpha, miu = alpha2[0], alpha2[1]
    alpha_raw, miu_raw = alpha_raw2[0], alpha_raw2[1]
    ok_a, ok_m = ok2[0], ok2[1]
    # MtAwc check: bob's w commitment must match g_w_j (mta/mod.rs:204-209)
    gw_peers = dec.point_take(g_w, peers, 1)
    gwc = np.asarray(dec.point_eq(msg_b_w.b_proof.pk, gw_peers))
    # responder-side failures blame bob j: fold packed slots onto the bob
    # axis via the inverse index (peers[iinv[j, kk], kk] == j)
    mta_ok = (ok_a & ok_m & gwc)[:, iinv, kidx].all(axis=2)   # [S, bob]

    kg = np.mod(k * gamma, Q)
    kw = np.mod(k * w, Q)
    # delta_i = k_i gamma_i + sum_k alpha[i, k] (alice side, packed axis)
    #          + sum over slots where party i is the bob (inverse fold)
    delta_i = np.mod(kg + np.sum(alpha, axis=2) + np.sum(beta_g[:, iinv, kidx], axis=2), Q)
    sigma_i = np.mod(kw + np.sum(miu, axis=2) + np.sum(beta_w[:, iinv, kidx], axis=2), Q)

    if corrupt and corrupt.get("step") == 5:
        for b, pi in _corrupt_slots(corrupt["parties"], S):
            _double_mod_q(delta_i, b, pi)
    if corrupt and corrupt.get("step") == 6:
        for b, pi in _corrupt_slots(corrupt["parties"], S):
            _double_mod_q(sigma_i, b, pi)

    # phase 3: T_i = sigma_i G + l_i H2 + Pedersen proof (party_i.rs:620-634)
    l_i = rng.scalars((S, tp))
    ped = sigma.pedersen_prove(_sc(sigma_i), _sc(l_i), rng)
    T_i = ped.T
    ped_ok = sigma.pedersen_verify(ped)

    # phase 3-4: delta reconstruction, decommit gamma, R
    delta = np.mod(np.sum(delta_i, axis=1), Q)
    delta_inv = np.asarray([pow(int(d), -1, Q) if int(d) else 0 for d in delta], dtype=object)
    com_ok = (commit_rows(gg_dec_ints, blind1) == com1)
    gg_peers = dec.point_take(g_gamma_dec, peers, 1)
    pk_ok = np.asarray(dec.point_eq(msg_b_gamma.b_proof.pk, gg_peers))[
        :, iinv, kidx
    ].all(axis=2)                                     # [S, bob]
    gamma_sum = dec.point_sum(g_gamma_dec, axis=1)
    R = dec.scalar_mul(_sc(delta_inv), gamma_sum)
    r_x = batch_from_limbs(np.asarray(dec.x_coord_mod_q(R)))

    # phase 5: R_bar = k_i R + PDLwSlack to each peer (party_i.rs:691-766)
    R_pairs = dec.point_expand(R, 1)
    R_bar = dec.scalar_mul(_sc(k), R_pairs)           # [S, tp]
    pdl_stmt = PDLwSlackStatementBatch(
        ciphertext=np.broadcast_to(c_a[:, :, None], pshape),
        ek=ek_alice_pairs,
        Q_pt=dec.point_expand(R_bar, 2),
        G_pt=dec.point_expand(R_pairs, 2),
        dlog=stmt_peers,                              # peer j's statement
    )
    pdl_proofs = pdl_slack_prove(
        np.broadcast_to(k[:, :, None], pshape),
        None if r_a_t is not None else np.broadcast_to(r_a[:, :, None], pshape),
        pdl_stmt,
        rng,
        r_t=None if r_a_t is None else r_a_t[:, :, None],
    )
    from ...zk.batch_verify import pdl_slack_verify_fast

    pdl_ok = pdl_slack_verify_fast(pdl_proofs, pdl_stmt)  # [S, alice, tp-1]

    # phase5_check_R_dash_sum: sum R_bar == G (party_i.rs:768-776)
    rb_sum = dec.point_sum(R_bar, axis=1)
    rdash_ok = np.asarray(dec.point_eq(rb_sum, dec.generator((S,))))

    # phase 6: S_i = sigma_i R + HomoElGamal consistency (party_i.rs:778-848)
    S_i = dec.scalar_mul(_sc(sigma_i), R_pairs)
    heg = sigma.homo_elgamal_prove(
        _sc(l_i), _sc(sigma_i),
        R_pairs, dec.base_point2((S, tp)), dec.generator((S, tp)), T_i, S_i, rng,
    )
    heg_ok = sigma.homo_elgamal_verify(
        heg, R_pairs, dec.base_point2((S, tp)), dec.generator((S, tp)), T_i, S_i
    )
    s_sum = dec.point_sum(S_i, axis=1)
    s_sum_ok = np.asarray(dec.point_eq(s_sum, key.y))

    # fold pair matrices onto the culpable axis: prover/alice failures blame
    # the alice axis (reduce the packed peer axis); responder/bob failures
    # were folded onto the bob axis above via the inverse index — mirroring
    # the reference's `ind` bookkeeping (party_i.rs:650-666, 729-754)
    per_party_ok = (
        alice_ok.all(axis=2) & pdl_ok.all(axis=2)
        & mta_ok & pk_ok
        & ped_ok & com_ok & heg_ok
    )  # [S, tp]
    ok = per_party_ok.all(axis=1) & rdash_ok & s_sum_ok
    debug_masks = {
        "alice": alice_ok, "pdl": pdl_ok, "mta": mta_ok, "pk": pk_ok,
        "ped": ped_ok, "com": com_ok, "heg": heg_ok,
        "rdash": rdash_ok, "s_sum": s_sum_ok,
    }

    # blame inputs stay DENSE [S, alice, bob] (blame.py replays eye-masked
    # dense matrices); diagonal fills are inert under the eye masks
    dense = lambda a, fill: _unpack_dense(np.asarray(a, dtype=object), peers, fill)
    # the responder randomness is only revealed on blame: when the
    # randomizer tables deferred its launch, keep it deferred (blame
    # resolves); the gamma path is row 0 of the stacked pair
    from ...core.modctx import LazyMap

    if hasattr(beta_rand2, "ints"):
        beta_rand_dense = LazyMap(
            beta_rand2, lambda v: _unpack_dense(np.asarray(v, dtype=object)[0], peers, 1)
        )
    else:
        beta_rand_dense = dense(beta_rand2[0], 1)
    return OfflineState(
        s_parties=s_parties, R=R, r_x=r_x, k=k, sigma_i=sigma_i, delta_i=delta_i,
        y=key.y, ok=np.asarray(ok), bad_actors=~per_party_ok,
        k_randomness=r_a, gamma=gamma, beta_g=dense(beta_g, 0),
        beta_randomness=beta_rand_dense,
        beta_tag=dense(beta_tag, 0), alpha=dense(alpha_raw, 0), msg_a_c=c_a,
        msg_b_gamma_c=dense(msg_b_gamma.c, 0),
        R_bar=R_bar, S_i=S_i, T_i=T_i, l_i=l_i,
        m_b_w_c=dense(msg_b_w.c, 1), miu=dense(miu_raw, 0), ni=dense(beta_w, 0),
        debug_masks=debug_masks, g_gamma_decommit=g_gamma_dec,
    )


def refresh_private_key(
    key: LocalKeyBatch20, factor_ints, rng: SessionRng, safe_primes: bool = False,
) -> LocalKeyBatch20:
    """Proactive key rotation (gg_2020/party_i.rs:459-499
    refresh_private_key / refresh_private_key_safe_prime): u_i += factor,
    fresh Paillier keypair AND fresh ring-Pedersen (h1, h2, N_tilde) setup
    per slot.  Primes are RANDOM by default; safe_primes=True selects the
    refresh_private_key_safe_prime variant (party_i.rs:481-499).

    factor_ints: [S, n] additive factors — a refresh ceremony supplies
    zero-sum factors so y is invariant; like the reference, this applies
    whatever it is given.
    """
    S, n, bits = key.S, key.n, key.paillier_bits
    factor = np.mod(np.asarray(factor_ints, dtype=object), Q)
    u_new = np.mod(key.u + factor, Q)
    y_i_new = dec.mul_generator(_sc(u_new))
    p_fac, q_fac = gen_paillier_batch(S, n, bits, rng, safe=safe_primes)
    ns = p_fac * q_fac
    nt_ctx, h1, h2, _xhi, _xhi_inv, _phi = generate_h1_h2_n_tilde_batch(S, n, bits, rng)
    stmt = DlogStatementBatch(ctx=nt_ctx, h1=h1, h2=h2)
    stmt.ensure_tables()
    return dataclasses.replace(
        key,
        u=u_new,
        y_i=y_i_new,
        y=dec.point_sum(y_i_new, axis=1),
        p=p_fac,
        q=q_fac,
        ek=PaillierCtxBatch.from_ints(ns, bits).attach_sk(p_fac, q_fac),
        dk=dp.BatchDecryptionKey.from_ints(p_fac, q_fac, bits),
        dlog_stmt=stmt,
    )


def update_private_key(key: LocalKeyBatch20, factor_u, factor_x) -> LocalKeyBatch20:
    """PartyPrivate::update_private_key (gg_2020/party_i.rs:513-523):
    additive update of u_i and x_i; Paillier and ring-Pedersen untouched."""
    u_new = np.mod(key.u + np.asarray(factor_u, dtype=object), Q)
    x_new = np.mod(key.x + np.asarray(factor_x, dtype=object), Q)
    y_i_new = dec.mul_generator(_sc(u_new))
    return dataclasses.replace(
        key, u=u_new, x=x_new, y_i=y_i_new, y=dec.point_sum(y_i_new, axis=1)
    )


def to_encrypted_segments(
    key: LocalKeyBatch20, segment_size: int, num_segments: int, pub_y, rng: SessionRng
):
    """Verifiable backup of every u_i share (gg_2020/party_i.rs:503-511
    to_encrypted_segment) — same centipede segmentation as the GG18 path."""
    from ...host import backup

    return backup.backup_batch(key.u, segment_size, num_segments, pub_y, rng)


@dataclasses.dataclass
class SignResult20:
    r: np.ndarray
    s: np.ndarray
    recid: np.ndarray
    ok: np.ndarray
    sig_valid: np.ndarray
    s_i: np.ndarray = None  # [S, tp] partial sigs (for phase-7 blame)


def sign_online(off: OfflineState, m_int, corrupt: dict | None = None) -> SignResult20:
    """Phase 7: one-round online signing (party_i.rs:850-910)."""
    S = off.k.shape[0]
    m_arr = np.broadcast_to(np.asarray(m_int, dtype=object), (S,))
    s_i = np.mod(np.mod(m_arr, Q)[:, None] * off.k + off.r_x[:, None] * off.sigma_i, Q)
    if corrupt and corrupt.get("step") == 7:
        for b, pi in _corrupt_slots(corrupt["parties"], S):
            _double_mod_q(s_i, b, pi)
    s_sum = np.mod(np.sum(s_i, axis=1), Q)
    _, ry_l, _ = dec.to_affine(off.R)
    ry = batch_from_limbs(np.asarray(ry_l))
    recid = np.empty(S, dtype=object)
    s_final = np.empty(S, dtype=object)
    for b in range(S):
        sv = int(s_sum[b])
        rec = (int(ry[b]) % Q) & 1
        if sv > Q - sv:
            sv = Q - sv
            rec ^= 1
        s_final[b] = sv
        recid[b] = rec
    y_host = dec.points_to_host(off.y)
    # third-party oracle (OpenSSL secp256k1) — the libsecp check_sig role of
    # gg_2020/test.rs:711-748, and ~20x faster than the pure-python verifier
    sig_valid = np.asarray(
        hec.ecdsa_verify_batch(y_host, np.mod(m_arr, Q), off.r_x, s_final)
    )
    ok = off.ok & sig_valid
    return SignResult20(r=off.r_x, s=s_final, recid=recid, ok=ok, sig_valid=sig_valid, s_i=s_i)
