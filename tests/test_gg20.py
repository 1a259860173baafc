"""GG20 end-to-end: keygen invariants, offline + online signing with range
proofs and PDL (reference: gg_2020/test.rs keygen_t_n_parties/sign).
Corrupt-and-blame scenarios live in test_gg20_blame.py (split r5: together
the two files sat at this jaxlib's accumulated-compile segfault threshold).

The 3-party keygen fixture is disk-cached (tests/keycache.py); the keygen
PATH keeps uncached coverage via test_small_paillier_rejected below (an
honest full keygen run) and the corrupted-keygen test in
test_gg20_adversarial.py."""

import hashlib

import numpy as np
import pytest

from tpu_mpc.host import ec as hec
from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.utils.rng import SessionRng
from tpu_mpc.vss import feldman

from keycache import cached_keygen

BITS = 768  # smallest width where k*gamma + beta-prime cannot wrap mod n
S = 2


@pytest.fixture(scope="module")
def keypair():
    return cached_keygen(0x20, S, 1, 3, BITS)


def test_keygen_invariants(keypair):
    key, _ = keypair
    from tpu_mpc.ec import secp256k1 as dec

    for b in range(S):
        x_total = sum(int(v) for v in key.u[b]) % hec.N
        rec = feldman.reconstruct([0, 2], [int(key.x[b, 0]), int(key.x[b, 2])])
        assert rec == x_total
        assert dec.points_to_host(key.y)[b] == hec.mul(x_total)


def test_offline_online_sign(keypair):
    key, rng = keypair
    m = int.from_bytes(hashlib.sha256(b"gg20 message").digest(), "big")
    off = gg20.offline_stage(key, [0, 1], rng)
    assert off.ok.all(), f"offline failed, bad={off.bad_actors}"
    sig = gg20.sign_online(off, m)
    assert sig.sig_valid.all()
    for b in range(S):
        assert int(sig.s[b]) <= hec.N // 2


def test_sign_full_quorum(keypair):
    key, rng = keypair
    m = 987654321
    off = gg20.offline_stage(key, [0, 1, 2], rng)
    assert off.ok.all()
    sig = gg20.sign_online(off, m)
    assert sig.sig_valid.all()


def test_small_paillier_rejected():
    """Undersized Paillier modulus fails keygen policy
    (test_small_paillier, gg_2020/test.rs:764-783).  Also the suite's
    honest UNCACHED keygen run (the fixtures are disk-cached)."""
    rng = SessionRng(0x21)
    res = gg20.keygen(1, 1, 2, rng, paillier_bits=BITS)
    assert res.ok.all()
    # policy check itself: a (bits-2) modulus would violate min bound
    n_small = int(res.key.ek.n[0, 0]) >> 4
    assert not (BITS - 1 <= n_small.bit_length() <= BITS)
