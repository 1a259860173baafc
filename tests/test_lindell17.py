"""Lindell'17 two-party ECDSA E2E (reference: lindell_2017/test.rs)."""

import hashlib

import numpy as np

from tpu_mpc.host import ec as hec
from tpu_mpc.protocols.lindell17 import batch as l17
from tpu_mpc.utils.rng import SessionRng

# Lindell'17 needs n > q^3 (the partial sig plaintext is rho*q + ...):
# 1024-bit Paillier is the smallest test width with margin.
BITS = 1024
S = 2


def test_keygen_and_sign():
    rng = SessionRng(0x17)
    kg = l17.keygen(S, rng, paillier_bits=BITS)
    assert kg.ok.all()
    # pubkey consistency: y = x1 x2 G
    from tpu_mpc.ec import secp256k1 as dec

    for b in range(S):
        want = hec.mul(int(kg.p1.x1[b]) * int(kg.p2.x2[b]) % hec.N)
        assert dec.points_to_host(kg.p1.pubkey)[b] == want

    m = int.from_bytes(hashlib.sha256(b"lindell msg").digest(), "big")
    sig = l17.sign(kg, m, rng)
    assert sig.ok.all() and sig.sig_valid.all()
    for b in range(S):
        assert int(sig.s[b]) <= hec.N // 2


def test_refresh_preserves_pubkey_and_signs():
    rng = SessionRng(0x18)
    kg = l17.keygen(S, rng, paillier_bits=BITS)
    assert kg.ok.all()
    factor = rng.scalars((S,))
    kg2 = l17.refresh_private_key(kg, factor, rng)
    assert kg2.ok.all()
    sig = l17.sign(kg2, 424242, rng)
    assert sig.sig_valid.all()


def test_to_mta_message_b_conversion():
    """Lindell -> GG18 master-key conversion (party_one.rs:309-315,
    party_two.rs:259-271): the MtA over Enc(x1) with b = x2 yields additive
    shares alpha + beta == x1 * x2 mod q — the GG18 master key."""
    rng = SessionRng(0x2177)
    kg = l17.keygen(S, rng, paillier_bits=BITS)
    assert kg.ok.all()
    msg_b, beta = l17.party_two_to_mta_message_b(kg.p2, rng)
    alpha, ok = l17.party_one_to_mta_message_b(kg.p1, msg_b)
    assert ok.all()
    q = hec.N
    for s in range(S):
        assert (int(alpha[s]) + int(beta[s])) % q == \
            int(kg.p1.x1[s]) * int(kg.p2.x2[s]) % q
