"""CCLST'19 class-group two-party ECDSA (reference: cclst_2019/test.rs)."""

from tpu_mpc.host import class_group as cg
from tpu_mpc.host import ec as hec
from tpu_mpc.protocols.cclst19 import batch as cclst
from tpu_mpc.utils.rng import SessionRng

DISC_BITS = 600  # small test discriminant; 1348 in production (Cargo bench default)


def test_class_group_laws():
    f = cg.prime_form(-71, 3)
    i = cg.identity(-71)
    assert cg.compose(i, f) == cg.reduce_form(f)
    assert cg.pow_form(f, 7) == i  # h(-71) = 7
    assert cg.compose(f, cg.inverse(f)) == i
    assert cg.compose(cg.compose(f, f), f) == cg.compose(f, cg.compose(f, f))


def test_hsmcl_encrypt_decrypt_homomorphic():
    rng = SessionRng(0xCC)
    g = cg.CLGroup.from_seed(b"t", DISC_BITS)
    sk, pk = g.keygen(rng)
    m = 0x123456789ABCDEF
    ct, rho = g.encrypt(pk, m, rng)
    assert g.decrypt(sk, ct) == m
    ct2, _ = g.encrypt(pk, 55, rng)
    assert g.decrypt(sk, g.eval_sum(ct, ct2)) == (m + 55) % g.q
    assert g.decrypt(sk, g.eval_scal(ct, 3)) == (m * 3) % g.q
    X = hec.mul(m)
    proof = cg.cldl_prove(g, pk, ct, X, m, rho, rng)
    assert cg.cldl_verify(g, pk, ct, X, proof)
    bad = cg.CLDLProof(proof.t1, proof.t2, proof.T, proof.u_r + 1, proof.u_m)
    assert not cg.cldl_verify(g, pk, ct, X, bad)


def test_cclst_keygen_and_sign():
    rng = SessionRng(0xCD)
    sessions = cclst.keygen(2, rng, disc_bits=DISC_BITS)
    assert all(s.ok for s in sessions)
    for s in sessions:
        assert s.pubkey == hec.mul(s.x1 * s.x2 % hec.N)
    sigs = cclst.sign(sessions, 0xFEEDFACE, rng)
    assert all(sig.valid for sig in sigs)
    for sig in sigs:
        assert sig.s <= hec.N // 2
