"""Cross-session small-exponent batch verification (zk/batch_verify.py).

Covers: batched path equivalence with the per-session verifiers on honest
proofs (no fallback), per-session blame via fallback on an equation-level
tamper, no-fallback rejection of host-check failures (gamma masking), and
the distinct-keys fallback.  Reference behavior being preserved: the
verifier loops of mta/range_proofs.rs:105-156 and zk_pdl_with_slack/
mod.rs:127-160.
"""

import dataclasses

import numpy as np
import pytest

from tpu_mpc.ec import secp256k1 as dec
from tpu_mpc.host import ec as hec
from tpu_mpc.mta import mta
from tpu_mpc.protocols.gg18.batch import gen_paillier_batch
from tpu_mpc.protocols.gg20.batch import generate_h1_h2_n_tilde_batch
from tpu_mpc.utils.rng import SessionRng
from tpu_mpc.zk import batch_verify as bv
from tpu_mpc.zk.pdl_slack import (
    PDLwSlackStatementBatch,
    pdl_slack_prove,
    pdl_slack_verify,
)
from tpu_mpc.zk.range_proofs import (
    DlogStatementBatch,
    PaillierCtxBatch,
    alice_prove,
    alice_verify,
)

Q = hec.N
BITS = 768
S = 8  # >= batch_verify._MIN_SESSIONS so the batched path engages


@pytest.fixture(scope="module")
def setup():
    rng = SessionRng(0xBA7C)
    p, q = gen_paillier_batch(1, 1, BITS, rng)
    ek1 = PaillierCtxBatch.from_ints((p * q)[:, 0], BITS)
    nt_ctx, h1, h2, _, _, _ = generate_h1_h2_n_tilde_batch(1, 1, BITS, rng)
    stmt1 = DlogStatementBatch.from_ints(
        nt_ctx.n_ints[:, 0], h1[:, 0], h2[:, 0], BITS
    )
    stmt1.ensure_tables()
    # one key set tiled across S sessions — the production/bench pattern
    return ek1.tile(S), stmt1.tile(S), rng


def _no_fallback(monkeypatch, name):
    def boom(*a, **k):
        raise AssertionError(f"per-session fallback {name} must not run")

    monkeypatch.setattr(bv, name, boom)


def _alice(setup):
    ek, stmt, rng = setup
    a = rng.below(Q, (S,))
    r = rng.units_below(ek.n, (S,))
    c = mta.paillier_encrypt_ints(ek, a, r)
    return alice_prove(a, c, ek, stmt, r, rng), c, ek, stmt


def test_alice_batched_honest_no_fallback(setup, monkeypatch):
    proof, c, ek, stmt = _alice(setup)
    _no_fallback(monkeypatch, "alice_verify")
    assert bv.alice_verify_fast(proof, c, ek, stmt).all()


def test_alice_batched_equation_tamper_blames_session(setup):
    proof, c, ek, stmt = _alice(setup)
    # tamper the s response of session 3 only: host checks still pass, the
    # batched product equation fails, the fallback attributes the session
    s_bad = np.asarray(proof.s, dtype=object).copy()
    s_bad[3] = int(s_bad[3]) * 2 % int(np.broadcast_to(ek.n, (S,))[3])
    bad = dataclasses.replace(proof, s=s_bad)
    got = bv.alice_verify_fast(bad, c, ek, stmt)
    want = alice_verify(bad, c, ek, stmt)
    assert np.array_equal(got, want)
    assert not got[3] and got[np.arange(S) != 3].all()


def test_alice_width_failure_masked_not_fallback(setup, monkeypatch):
    proof, c, ek, stmt = _alice(setup)
    # oversized s2 in session 5: the host width check fails there, its gamma
    # is zeroed, and the batched equation must still pass for the rest —
    # no per-session replay
    s2_bad = np.asarray(proof.s2, dtype=object).copy()
    s2_bad[5] = int(s2_bad[5]) + (1 << 4000)
    bad = dataclasses.replace(proof, s2=s2_bad)
    _no_fallback(monkeypatch, "alice_verify")
    got = bv.alice_verify_fast(bad, c, ek, stmt)
    assert not got[5] and got[np.arange(S) != 5].all()


def test_alice_distinct_keys_falls_back(setup):
    # distinct Paillier keys per session: moduli are not shared along the
    # sessions axis, so the fast path must detect it and verify per-session
    _, stmt, rng = setup
    p, q = gen_paillier_batch(S, 1, BITS, rng)
    ek = PaillierCtxBatch.from_ints((p * q)[:, 0], BITS)
    a = rng.below(Q, (S,))
    r = rng.units_below(ek.n, (S,))
    c = mta.paillier_encrypt_ints(ek, a, r)
    proof = alice_prove(a, c, ek, stmt, r, rng)
    assert bv.alice_verify_fast(proof, c, ek, stmt).all()
    bad = dataclasses.replace(proof, s1=np.asarray(proof.s1, dtype=object) + 1)
    assert not bv.alice_verify_fast(bad, c, ek, stmt).any()


def _pdl(setup):
    ek, stmt, rng = setup
    x = rng.below(Q, (S,))
    r = rng.units_below(ek.n, (S,))
    c = mta.paillier_encrypt_ints(ek, x, r)
    G = dec.generator((S,))
    Q_pt = dec.mul_generator(dec.sc_from_ints(np.mod(x, Q)))
    st = PDLwSlackStatementBatch(ciphertext=c, ek=ek, Q_pt=Q_pt, G_pt=G, dlog=stmt)
    return pdl_slack_prove(x, r, st, rng), st


def test_pdl_batched_honest_no_fallback(setup, monkeypatch):
    proof, st = _pdl(setup)
    _no_fallback(monkeypatch, "pdl_slack_verify")
    assert bv.pdl_slack_verify_fast(proof, st).all()


def test_pdl_batched_equation_tamper_blames_session(setup):
    proof, st = _pdl(setup)
    s2_bad = np.asarray(proof.s2, dtype=object).copy()
    s2_bad[2] = int(s2_bad[2]) * 3 % int(np.broadcast_to(st.ek.n, (S,))[2])
    bad = dataclasses.replace(proof, s2=s2_bad)
    got = bv.pdl_slack_verify_fast(bad, st)
    want = pdl_slack_verify(bad, st)
    assert np.array_equal(got, want)
    assert not got[2] and got[np.arange(S) != 2].all()


@pytest.fixture(scope="module")
def grouped_setup():
    """G=2 distinct key groups interleaved across S sessions (the
    multi-tenant serving layout: session s uses group s % G)."""
    rng = SessionRng(0x68F0)
    G = 2
    p, q = gen_paillier_batch(G, 1, BITS, rng)
    ekG = PaillierCtxBatch.from_ints((p * q)[:, 0], BITS)
    nt_ctx, h1, h2, _, _, _ = generate_h1_h2_n_tilde_batch(G, 1, BITS, rng)
    stmtG = DlogStatementBatch.from_ints(
        nt_ctx.n_ints[:, 0], h1[:, 0], h2[:, 0], BITS
    )
    ek = ekG.repeat_interleaved(S // G)
    stmt = stmtG.repeat_interleaved(S // G)
    assert ek.n_groups == G and stmt.n_groups == G
    return ek, stmt, rng


def test_alice_grouped_batched_no_fallback(grouped_setup, monkeypatch):
    ek, stmt, rng = grouped_setup
    a = rng.below(Q, (S,))
    r = rng.units_below(ek.n, (S,))
    c = mta.paillier_encrypt_ints(ek, a, r)
    proof = alice_prove(a, c, ek, stmt, r, rng)
    # per-group reductions must collapse the checks with NO per-session
    # replay even though the sessions axis holds 2 distinct key sets
    _no_fallback(monkeypatch, "alice_verify")
    assert bv.alice_verify_fast(proof, c, ek, stmt).all()


def test_alice_grouped_tamper_blames_session(grouped_setup):
    ek, stmt, rng = grouped_setup
    a = rng.below(Q, (S,))
    r = rng.units_below(ek.n, (S,))
    c = mta.paillier_encrypt_ints(ek, a, r)
    proof = alice_prove(a, c, ek, stmt, r, rng)
    s_bad = np.asarray(proof.s, dtype=object).copy()
    s_bad[3] = int(s_bad[3]) * 2 % int(np.broadcast_to(ek.n, (S,))[3])
    bad = dataclasses.replace(proof, s=s_bad)
    got = bv.alice_verify_fast(bad, c, ek, stmt)
    assert not got[3] and got[np.arange(S) != 3].all()


def test_pdl_grouped_batched_no_fallback(grouped_setup, monkeypatch):
    ek, stmt, rng = grouped_setup
    x = rng.below(Q, (S,))
    r = rng.units_below(ek.n, (S,))
    c = mta.paillier_encrypt_ints(ek, x, r)
    Gpt = dec.generator((S,))
    Q_pt = dec.mul_generator(dec.sc_from_ints(np.mod(x, Q)))
    st = PDLwSlackStatementBatch(ciphertext=c, ek=ek, Q_pt=Q_pt, G_pt=Gpt, dlog=stmt)
    proof = pdl_slack_prove(x, r, st, rng)
    _no_fallback(monkeypatch, "pdl_slack_verify")
    assert bv.pdl_slack_verify_fast(proof, st).all()


def test_gammas_are_fresh_and_wide():
    g1 = bv.sample_gammas((4, 3))
    g2 = bv.sample_gammas((4, 3))
    assert g1.shape == (4, 3) and g2.shape == (4, 3)
    assert any(int(v) != int(w) for v, w in zip(g1.reshape(-1), g2.reshape(-1)))
    assert all(int(v).bit_length() <= bv.GAMMA_BITS for v in g1.reshape(-1))
