"""GG20 variants split from test_gg20.py: that file alone sits at this
jaxlib's in-process compile-count segfault threshold (see conftest.py), and
these tests compile their own shape set (n=2 quorums, randomizer tables).
Self-contained — no shared fixtures."""

import numpy as np
import pytest

from tpu_mpc.host import ec as hec
from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.protocols.gg20 import blame
from tpu_mpc.utils.rng import SessionRng

BITS = 768


def test_safe_prime_keygen_and_scrub():
    """Keys::create_safe_prime (gg_2020/party_i.rs:180-196): the Paillier
    factors are safe primes p = 2p'+1; signing works unchanged.  Also covers
    OfflineState.scrub (zeroize-on-drop analog)."""
    from tpu_mpc.host import primes

    rng = SessionRng(0x5AFE)
    res = gg20.keygen(1, 1, 2, rng, paillier_bits=BITS, safe_primes=True)
    assert res.ok.all()
    for fac in (res.key.p, res.key.q):
        for v in fac.reshape(-1):
            assert primes.is_probable_prime(int(v))
            assert primes.is_probable_prime((int(v) - 1) // 2)
    off = gg20.offline_stage(res.key, [0, 1], rng)
    sig = gg20.sign_online(off, 0xD1CE5)
    assert sig.ok.all() and sig.sig_valid.all()
    off.scrub()
    assert all(int(v) == 0 for v in off.k.reshape(-1))
    assert all(int(v) == 0 for v in off.sigma_i.reshape(-1))
    assert all(int(v) == 0 for v in off.beta_g.reshape(-1))


@pytest.mark.slow
def test_offline_with_enc_tables(monkeypatch):
    """Full offline+online pass with the randomizer-base tables forced on
    (THREAT_MODEL §7): same signatures/checks as uniform sampling."""
    from tpu_mpc.zk import range_proofs as rp

    monkeypatch.setattr(rp, "_ENC_TABLES_ENV", "1")
    rng = SessionRng(0xE4C)
    res = gg20.keygen(1, 1, 2, rng, paillier_bits=BITS)
    assert res.ok.all()
    assert res.key.ek.enc_tab_g is not None
    off = gg20.offline_stage(res.key, [0, 1], rng)
    assert off.ok.all(), off.debug_masks
    sig = gg20.sign_online(off, 0xE4C123)
    assert sig.ok.all() and sig.sig_valid.all()
    # blame with table-sampled randomness: the deferred r = g^t handle
    # resolves during the phase-5 replay and the replay still attributes
    off_bad = gg20.offline_stage(
        res.key, [0, 1], rng, corrupt={"step": 5, "parties": [1]}
    )
    assert not off_bad.ok.any()
    assert blame.phase5_blame(res.key, off_bad) == [[1]]
