"""Interactive PDL (zk_pdl) + RangeProofNi roundtrips and soundness
(reference: zk_pdl/test.rs:13-58 and the zk-paillier crate's range proof)."""

import numpy as np

from tpu_mpc.host import ec as hec
from tpu_mpc.host import paillier as hp
from tpu_mpc.mta.mta import paillier_encrypt_ints
from tpu_mpc.paillier import paillier as dp
from tpu_mpc.utils.rng import SessionRng
from tpu_mpc.zk import pdl, range_proof_ni
from tpu_mpc.zk.range_proofs import PaillierCtxBatch
from tpu_mpc.ec import secp256k1 as dec

Q = hec.N
# smallest width where a*x + b < n always holds (a < q, x < q/3, b < q^2:
# the sum is < 2 q^2 ~ 2^513, so n must exceed 514 bits; reference uses 2048)
BITS = 576
S = 2


def make_setup(seed=5):
    rng = SessionRng(seed)
    r = rng._r
    keys = [hp.keypair(BITS, rng=r) for _ in range(S)]
    ek = PaillierCtxBatch.from_ints([k[0].n for k in keys], bits=BITS)
    dk = dp.BatchDecryptionKey.from_ints(
        [k[1].p for k in keys], [k[1].q for k in keys], bits=BITS
    )
    return rng, keys, ek, dk


def test_range_proof_ni_roundtrip():
    rng, keys, ek, _ = make_setup()
    x = rng.below(Q // 3, (S,))
    r_enc = rng.units_below(np.asarray([k[0].n for k in keys], dtype=object), (S,))
    c = paillier_encrypt_ints(ek, x, r_enc)
    proof = range_proof_ni.prove(ek, c, x, r_enc, rng)
    assert range_proof_ni.verify(proof, ek, c).all()


def test_range_proof_ni_soundness():
    """x far outside [0, q/3) cannot produce in-range masked responses."""
    rng, keys, ek, _ = make_setup(6)
    x = np.asarray([Q - 5] * S, dtype=object)  # way out of range
    r_enc = rng.units_below(np.asarray([k[0].n for k in keys], dtype=object), (S,))
    c = paillier_encrypt_ints(ek, x, r_enc)
    proof = range_proof_ni.prove(ek, c, x, r_enc, rng)
    assert not range_proof_ni.verify(proof, ek, c).any()


def test_zk_pdl_flow():
    rng, keys, ek, dk = make_setup(7)
    x = rng.below(Q // 3, (S,))
    r_enc = rng.units_below(np.asarray([k[0].n for k in keys], dtype=object), (S,))
    c = paillier_encrypt_ints(ek, x, r_enc)
    stmt = pdl.PDLStatementBatch(
        ciphertext=c, ek=ek, Q_pt=dec.mul_generator(dec.sc_from_ints(np.mod(x, Q)))
    )
    wit = pdl.PDLWitnessBatch(x=x, r=r_enc, dk=dk)

    v1, v_state = pdl.verifier_message1(stmt, rng)
    p1, p_state = pdl.prover_message1(wit, stmt, v1, rng)
    v2, range_ok = pdl.verifier_message2(p1, stmt, v_state)
    assert range_ok.all()
    p2, prover_ok = pdl.prover_message2(v1, v2, wit, p_state)
    assert prover_ok.all()
    assert pdl.verifier_finalize(p1, p2, v_state).all()


def test_zk_pdl_wrong_witness_fails():
    """Q != xG: the verifier's final Q-hat == aQ + bG check must fail
    (zk_pdl/test.rs soundness test)."""
    rng, keys, ek, dk = make_setup(8)
    x = rng.below(Q // 3, (S,))
    r_enc = rng.units_below(np.asarray([k[0].n for k in keys], dtype=object), (S,))
    c = paillier_encrypt_ints(ek, x, r_enc)
    wrong_Q = dec.mul_generator(dec.sc_from_ints(np.mod(x + 1, Q)))
    stmt = pdl.PDLStatementBatch(ciphertext=c, ek=ek, Q_pt=wrong_Q)
    wit = pdl.PDLWitnessBatch(x=x, r=r_enc, dk=dk)

    v1, v_state = pdl.verifier_message1(stmt, rng)
    p1, p_state = pdl.prover_message1(wit, stmt, v1, rng)
    v2, range_ok = pdl.verifier_message2(p1, stmt, v_state)
    assert range_ok.all()  # the ciphertext itself is fine
    p2, _ = pdl.prover_message2(v1, v2, wit, p_state)
    assert not pdl.verifier_finalize(p1, p2, v_state).any()
