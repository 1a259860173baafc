"""Production-width tier: one full GG20 2048-bit keygen + offline + online
e2e at S=1 (VERDICT r1: every fast test runs 768-bit, so a 2048-bit-only
correctness bug — like the round-1 CRT-decrypt recombination bug — would be
invisible outside the flaky TPU bench).  Marked slow; run with `make
test-slow` / nightly CI.
"""

import hashlib

import pytest

from tpu_mpc.host import ec as hec
from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.utils.rng import SessionRng


@pytest.mark.slow
def test_gg20_2048bit_e2e():
    rng = SessionRng(0x2048)
    res = gg20.keygen(1, 1, 2, rng, paillier_bits=2048)
    assert res.ok.all(), f"2048-bit keygen failed: {res.bad_actors}"
    # production policy bounds active at full width (party_i.rs:49-50)
    import numpy as np

    for nv in np.asarray(res.key.ek.n).reshape(-1):
        assert 2047 <= int(nv).bit_length() <= 2048

    m = int.from_bytes(hashlib.sha256(b"production width").digest(), "big")
    off = gg20.offline_stage(res.key, [0, 1], rng)
    assert off.ok.all(), f"2048-bit offline failed: {off.bad_actors}"
    sig = gg20.sign_online(off, m)
    assert sig.sig_valid.all()
    assert int(sig.s[0]) <= hec.N // 2
