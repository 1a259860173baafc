"""Direct unit tests for the MtA range proofs (Alice/Bob/BobExt).

Reference behavior: /root/reference/src/utilities/mta/range_proofs.rs
test block :537-674 (verify round-trips + soundness on out-of-range /
tampered inputs).  These exercise the inverse-free product formulation
(AliceProofBatch/BobProofBatch docstrings) directly — the protocol-level
suites only reach alice_verify, so bob_verify needs its own coverage.
"""

import dataclasses

import numpy as np
import pytest

from tpu_mpc.host import ec as hec
from tpu_mpc.mta import mta
from tpu_mpc.protocols.gg18.batch import gen_paillier_batch
from tpu_mpc.protocols.gg20.batch import generate_h1_h2_n_tilde_batch
from tpu_mpc.utils.rng import SessionRng
from tpu_mpc.zk.range_proofs import (
    DlogStatementBatch,
    PaillierCtxBatch,
    alice_prove,
    alice_verify,
    bob_prove,
    bob_verify,
)

Q = hec.N
BITS = 768
S = 4


@pytest.fixture(scope="module")
def setup():
    rng = SessionRng(0x5EED)
    p, q = gen_paillier_batch(S, 1, BITS, rng)
    ek = PaillierCtxBatch.from_ints((p * q)[:, 0], BITS)
    nt_ctx, h1, h2, _, _, _ = generate_h1_h2_n_tilde_batch(S, 1, BITS, rng)
    # flatten the party axis: a [S] statement batch
    stmt = DlogStatementBatch.from_ints(
        nt_ctx.n_ints[:, 0], h1[:, 0], h2[:, 0], BITS
    )
    return ek, stmt, rng


def test_alice_roundtrip_and_soundness(setup):
    ek, stmt, rng = setup
    a = rng.below(Q, (S,))
    r = rng.units_below(ek.n, (S,))
    c = mta.paillier_encrypt_ints(ek, a, r)
    proof = alice_prove(a, c, ek, stmt, r, rng)
    assert alice_verify(proof, c, ek, stmt).all()

    # tampered response s1 -> product equation fails
    bad = dataclasses.replace(proof, s1=proof.s1 + 1)
    assert not alice_verify(bad, c, ek, stmt).any()
    # tampered transmitted commitment u -> hash + equation fail
    bad = dataclasses.replace(proof, u=np.mod(proof.u + 1, ek.nn))
    assert not alice_verify(bad, c, ek, stmt).any()
    # oversized s2 is clamped, not crashed (attacker-controlled width)
    bad = dataclasses.replace(proof, s2=proof.s2 + (1 << 4000))
    assert not alice_verify(bad, c, ek, stmt).any()
    # out-of-range plaintext: honest proof for a >= q^3 must not verify
    big_a = np.asarray([Q**3 * 2] * S, dtype=object)
    r2 = rng.units_below(ek.n, (S,))
    c2 = mta.paillier_encrypt_ints(ek, big_a, r2)
    p2 = alice_prove(big_a, c2, ek, stmt, r2, rng)
    assert not alice_verify(p2, c2, ek, stmt).any()


def test_bob_roundtrip_and_soundness(setup):
    ek, stmt, rng = setup
    # Alice's ciphertext of a
    a = rng.below(Q, (S,))
    r = rng.units_below(ek.n, (S,))
    c_a = mta.paillier_encrypt_ints(ek, a, r)
    # Bob's response: c = a_enc^b * Enc(beta')
    b = rng.below(Q, (S,))
    beta_prim = rng.below(ek.n, (S,))
    r_b = rng.units_below(ek.n, (S,))
    c_btag = mta.paillier_encrypt_ints(ek, beta_prim, r_b)
    from tpu_mpc.zk.range_proofs import _mulmod

    b_ca = ek.nn_ctx.pow(c_a, b, 256)
    mta_c = _mulmod(b_ca, c_btag, ek.nn)

    proof = bob_prove(b, beta_prim, c_a, mta_c, r_b, ek, stmt, rng)
    assert bob_verify(proof, c_a, mta_c, ek, stmt).all()

    # tampered t1 -> v / w equations fail
    bad = dataclasses.replace(proof, t1=proof.t1 + 1)
    assert not bob_verify(bad, c_a, mta_c, ek, stmt).any()
    # tampered transmitted v -> hash + equation fail
    bad = dataclasses.replace(proof, v=np.mod(proof.v + 1, ek.nn))
    assert not bob_verify(bad, c_a, mta_c, ek, stmt).any()


def test_bob_wc_variant(setup):
    """BobProofExt: the wc variant's EC check s1 G == e X + u
    (range_proofs.rs:491-535)."""
    ek, stmt, rng = setup
    from tpu_mpc.core.limbs import batch_from_limbs
    from tpu_mpc.ec import secp256k1 as dec

    a = rng.below(Q, (S,))
    r = rng.units_below(ek.n, (S,))
    c_a = mta.paillier_encrypt_ints(ek, a, r)
    b = rng.below(Q, (S,))
    beta_prim = rng.below(ek.n, (S,))
    r_b = rng.units_below(ek.n, (S,))
    c_btag = mta.paillier_encrypt_ints(ek, beta_prim, r_b)
    from tpu_mpc.zk.range_proofs import _mulmod

    mta_c = _mulmod(ek.nn_ctx.pow(c_a, b, 256), c_btag, ek.nn)

    X = dec.mul_generator(dec.sc_from_ints(np.asarray(b, dtype=object)))
    xl, yl, _ = dec.to_affine(X)
    X_pts = (batch_from_limbs(np.asarray(xl)), batch_from_limbs(np.asarray(yl)))
    proof = bob_prove(
        b, beta_prim, c_a, mta_c, r_b, ek, stmt, rng, check=True, X_pts=X_pts
    )
    assert bob_verify(proof, c_a, mta_c, ek, stmt, X_pts=X_pts).all()
    # wrong X (b lies about its public point) -> wc check fails
    X2 = dec.mul_generator(dec.sc_from_ints(np.mod(b + 1, Q)))
    x2l, y2l, _ = dec.to_affine(X2)
    X2_pts = (batch_from_limbs(np.asarray(x2l)), batch_from_limbs(np.asarray(y2l)))
    assert not bob_verify(proof, c_a, mta_c, ek, stmt, X_pts=X2_pts).any()
