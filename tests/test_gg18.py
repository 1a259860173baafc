"""GG18 end-to-end: batched keygen + sign, validated against the independent
ECDSA oracle (reference test pattern: gg_2018/test.rs keygen_t_n_parties +
sign, with libsecp as the final check)."""

import hashlib

import numpy as np

from tpu_mpc.host import ec as hec
from tpu_mpc.protocols.gg18 import batch as gg18
from tpu_mpc.utils.rng import SessionRng
from tpu_mpc.vss import feldman

BITS = 768  # smallest width where k*gamma + beta-prime cannot wrap mod n
S = 2


def test_keygen_and_sign_t1_n3():
    rng = SessionRng(0xAA)
    res = gg18.keygen(S, 1, 3, rng, paillier_bits=BITS)
    assert res.ok.all(), f"keygen failed: {res.bad_actors}"
    key = res.key

    # u_i sum == reconstructed secret; y == sum(u) G  (gg_2020/test.rs:260-269 analog)
    for b in range(S):
        x_total = sum(int(v) for v in key.u[b]) % hec.N
        shares = [int(key.x[b, j]) for j in (0, 1)]
        rec = feldman.reconstruct([0, 1], shares)
        assert rec == x_total
        from tpu_mpc.ec import secp256k1 as dec

        y_host = dec.points_to_host(key.y)[b]
        assert y_host == hec.mul(x_total)

    m = int.from_bytes(hashlib.sha256(b"hello").digest(), "big")
    for subset in ([0, 1], [1, 2], [0, 2]):
        sig = gg18.sign(key, subset, m, rng)
        assert sig.ok.all(), f"sign protocol checks failed for {subset}"
        assert sig.sig_valid.all(), f"signature invalid for {subset}"
        # low-s enforced
        for b in range(S):
            assert int(sig.s[b]) <= hec.N // 2


def test_sign_all_three():
    rng = SessionRng(0xBB)
    res = gg18.keygen(S, 1, 3, rng, paillier_bits=BITS)
    key = res.key
    m = 12345678901234567890
    sig = gg18.sign(key, [0, 1, 2], m, rng)
    assert sig.ok.all() and sig.sig_valid.all()
