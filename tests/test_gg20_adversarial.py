"""GG20 adversarial matrix at reference parity: the 11 corruption tests of
gg_2020/test.rs:69-148 (multi-party corruption, n=5/t=2/ttag=4 and
n=8/t=4/ttag=6 quorums) plus the honest large-quorum runs and the
keygen-time undersized-Paillier rejection (test.rs:764-783).

Test names map 1:1 to the reference's; `corrupted` indices are positions in
the signing subset s, exactly like the reference's bad_actors.
"""

import numpy as np
import pytest

from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.protocols.gg20 import blame
from tpu_mpc.utils.rng import SessionRng

BITS = 768
S = 1


@pytest.fixture(scope="module")
def key_n2():
    rng = SessionRng(0x51)
    res = gg20.keygen(S, 1, 2, rng, paillier_bits=BITS)
    assert res.ok.all()
    return res.key, rng


@pytest.fixture(scope="module")
def key_n5():
    rng = SessionRng(0x52)
    res = gg20.keygen(S, 2, 5, rng, paillier_bits=BITS)
    assert res.ok.all()
    return res.key, rng


@pytest.fixture(scope="module")
def key_n8():
    rng = SessionRng(0x53)
    res = gg20.keygen(S, 4, 8, rng, paillier_bits=BITS)
    assert res.ok.all()
    return res.key, rng


def _corrupt_sign(key, rng, s_parties, step, parties):
    """Run offline(+online for step 7) with corruption; return blame lists."""
    if step == 7:
        off = gg20.offline_stage(key, s_parties, rng)
        assert off.ok.all()
        sig = gg20.sign_online(off, 0xDEAD_BEEF, corrupt={"step": 7, "parties": parties})
        assert not sig.sig_valid.any()
        return blame.phase7_blame(off, sig.s_i, 0xDEAD_BEEF)
    off = gg20.offline_stage(key, s_parties, rng, corrupt={"step": step, "parties": parties})
    assert not off.ok.any()
    if step == 5:
        return blame.phase5_blame(key, off)
    return blame.phase6_blame(key, off, rng)


# --- honest large quorums (test.rs:60-67) -----------------------------------

def test_sign_n5_t2_ttag4(key_n5):
    key, rng = key_n5
    off = gg20.offline_stage(key, [0, 2, 3, 4], rng)
    assert off.ok.all(), f"offline failed: {off.bad_actors}"
    sig = gg20.sign_online(off, 0x5151)
    assert sig.sig_valid.all()


@pytest.mark.slow
def test_sign_n8_t4_ttag6(key_n8):
    key, rng = key_n8
    off = gg20.offline_stage(key, [0, 1, 2, 4, 6, 7], rng)
    assert off.ok.all(), f"offline failed: {off.bad_actors}"
    sig = gg20.sign_online(off, 0x8181)
    assert sig.sig_valid.all()


# --- step 5 corruption (test.rs:70-101) -------------------------------------

def test_sign_n2_t1_ttag1_corrupt_step5_party1(key_n2):
    key, rng = key_n2
    assert _corrupt_sign(key, rng, [0, 1], 5, [0]) == [[0]] * S


def test_sign_n2_t1_ttag1_corrupt_step5_party2(key_n2):
    key, rng = key_n2
    assert _corrupt_sign(key, rng, [0, 1], 5, [1]) == [[1]] * S


def test_sign_n2_t1_ttag1_corrupt_step5_party12(key_n2):
    key, rng = key_n2
    assert _corrupt_sign(key, rng, [0, 1], 5, [0, 1]) == [[0, 1]] * S


def test_sign_n5_t2_ttag4_corrupt_step5_party1(key_n5):
    key, rng = key_n5
    assert _corrupt_sign(key, rng, [0, 2, 3, 4], 5, [0]) == [[0]] * S


def test_sign_n5_t2_ttag4_corrupt_step5_party14(key_n5):
    key, rng = key_n5
    assert _corrupt_sign(key, rng, [0, 2, 3, 4], 5, [0, 3]) == [[0, 3]] * S


# --- step 6 corruption (test.rs:103-134) ------------------------------------

def test_sign_n2_t1_ttag1_corrupt_step6_party1(key_n2):
    key, rng = key_n2
    assert _corrupt_sign(key, rng, [0, 1], 6, [0]) == [[0]] * S


def test_sign_n2_t1_ttag1_corrupt_step6_party2(key_n2):
    key, rng = key_n2
    assert _corrupt_sign(key, rng, [0, 1], 6, [1]) == [[1]] * S


def test_sign_n2_t1_ttag1_corrupt_step6_party12(key_n2):
    key, rng = key_n2
    assert _corrupt_sign(key, rng, [0, 1], 6, [0, 1]) == [[0, 1]] * S


def test_sign_n5_t2_ttag4_corrupt_step6_party1(key_n5):
    key, rng = key_n5
    assert _corrupt_sign(key, rng, [0, 2, 3, 4], 6, [0]) == [[0]] * S


def test_sign_n5_t2_ttag4_corrupt_step6_party14(key_n5):
    key, rng = key_n5
    assert _corrupt_sign(key, rng, [0, 2, 3, 4], 6, [0, 3]) == [[0, 3]] * S


# --- step 7 corruption (test.rs:136-148) ------------------------------------

def test_sign_n2_t1_ttag1_corrupt_step7_party2(key_n2):
    key, rng = key_n2
    assert _corrupt_sign(key, rng, [0, 1], 7, [1]) == [[1]] * S


def test_sign_n5_t2_ttag4_corrupt_step7_party24(key_n5):
    key, rng = key_n5
    assert _corrupt_sign(key, rng, [0, 2, 3, 4], 7, [1, 3]) == [[1, 3]] * S


# --- keygen-time policy: undersized Paillier modulus (test.rs:764-783) ------

def test_small_paillier_keygen_rejected_end_to_end():
    """A party presenting a half-width Paillier key passes its own proofs but
    MUST be flagged by the bit-length policy during keygen round 2."""
    rng = SessionRng(0x54)
    res = gg20.keygen(S, 1, 2, rng, paillier_bits=BITS, corrupt={"small_paillier": [1]})
    assert not res.ok.any()
    assert res.bad_actors[:, 1].all(), "undersized party not flagged"
    assert not res.bad_actors[:, 0].any(), "honest party wrongly flagged"
