"""Sigma proofs + Feldman VSS: completeness, soundness smoke, batch behavior."""

import numpy as np

from tpu_mpc.ec import secp256k1 as ec
from tpu_mpc.host import ec as hec
from tpu_mpc.utils.rng import SessionRng
from tpu_mpc.vss import feldman
from tpu_mpc.zk import sigma


def test_dlog_prove_verify():
    rng = SessionRng(1)
    xs = rng.scalars((3,))
    x = ec.sc_from_ints(xs)
    proof = sigma.dlog_prove(x, rng)
    assert sigma.dlog_verify(proof).all()
    # tampered pk must fail
    bad = sigma.DLogProof(pk=ec.mul_generator(ec.sc_from_ints(rng.scalars((3,)))),
                          commitment=proof.commitment, z=proof.z)
    assert not sigma.dlog_verify(bad).any()


def test_homo_elgamal_gg20_shape():
    # GG20 phase-6 statement: G=R, H=base_point2, Y=g, D=T, E=S
    rng = SessionRng(2)
    S = 4
    sig_ = rng.scalars((S,))
    ell = rng.scalars((S,))
    sigma_l = ec.sc_from_ints(sig_)
    l_l = ec.sc_from_ints(ell)
    R = ec.mul_generator(ec.sc_from_ints(rng.scalars((S,))))
    G = R
    H = ec.base_point2((S,))
    Y = ec.generator((S,))
    # T = l*Y + sigma*H? no: per reference T = sigma*G + l*base_point2,
    # statement D = x H + r Y with x=l, r=sigma ->
    # D = l*base_point2 + sigma*g  ... matches T with (H=bp2, Y=g)? T = g*sigma + bp2*l
    D = ec.point_add(ec.scalar_mul(ell_limbs := l_l, H), ec.scalar_mul(sigma_l, Y))
    E = ec.scalar_mul(sigma_l, G)
    proof = sigma.homo_elgamal_prove(l_l, sigma_l, G, H, Y, D, E, rng)
    assert sigma.homo_elgamal_verify(proof, G, H, Y, D, E).all()
    # wrong statement fails
    assert not sigma.homo_elgamal_verify(proof, G, H, Y, E, D).any()


def test_pedersen():
    rng = SessionRng(3)
    m = ec.sc_from_ints(rng.scalars((2,)))
    r = ec.sc_from_ints(rng.scalars((2,)))
    proof = sigma.pedersen_prove(m, r, rng)
    assert sigma.pedersen_verify(proof).all()


def test_ecddh():
    rng = SessionRng(4)
    S = 2
    x = ec.sc_from_ints(rng.scalars((S,)))
    g1 = ec.generator((S,))
    g2 = ec.mul_generator(ec.sc_from_ints(rng.scalars((S,))))
    h1 = ec.scalar_mul(x, g1)
    h2 = ec.scalar_mul(x, g2)
    proof = sigma.ecddh_prove(x, g1, g2, rng)
    assert sigma.ecddh_verify(proof, g1, h1, g2, h2).all()
    assert not sigma.ecddh_verify(proof, g1, h2, g2, h1).any()


def test_vss_share_validate_reconstruct():
    rng = SessionRng(5)
    t, n, S = 1, 3, 4
    secrets = rng.scalars((S,))
    scheme, shares = feldman.share(t, n, secrets, rng)
    for j in range(n):
        ok = feldman.validate_share(scheme, shares[:, j], j)
        assert ok.all(), f"share {j} failed validation"
    # commitment[0] == secret * G
    c0 = feldman.point_index(scheme.commitments, 0)
    y = ec.mul_generator(ec.sc_from_ints(secrets))
    assert np.asarray(ec.point_eq(c0, y)).all()
    # reconstruction from any t+1 subset
    for subset in ([0, 1], [1, 2], [0, 2]):
        for b in range(S):
            got = feldman.reconstruct(subset, [int(shares[b, j]) for j in subset])
            assert got == int(secrets[b])
    # corrupted share fails
    bad = np.array([int(shares[b, 0]) + 1 for b in range(S)], dtype=object)
    assert not feldman.validate_share(scheme, bad, 0).any()


def test_lagrange_weights_sum():
    # w_i = lambda_i * x_i reconstructs: direct identity check
    rng = SessionRng(6)
    import random
    r = random.Random(9)
    t, n = 2, 5
    poly = [r.randrange(hec.N) for _ in range(t + 1)]
    evalp = lambda x: sum(c * x**k for k, c in enumerate(poly)) % hec.N
    s = [0, 2, 4]
    acc = 0
    for j in s:
        acc = (acc + feldman.lagrange_coeff(j, s) * evalp(j + 1)) % hec.N
    assert acc == poly[0]
