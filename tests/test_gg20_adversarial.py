"""GG20 adversarial matrix at reference parity, n=2 quorums: the
corruption tests of gg_2020/test.rs:69-148 plus the keygen-time
undersized-Paillier rejection (test.rs:764-783).  The n=5/n=8 quorums live
in test_gg20_adv_quorum.py (separate process: distinct kernel shapes).

Test names map 1:1 to the reference's; `corrupted` indices are positions in
the signing subset s, exactly like the reference's bad_actors.

r5: each corruption STEP runs as ONE batched offline launch — the sessions
axis is the scenario axis (per-session corrupt sets, batch.py
_corrupt_slots), so the 7 n=2 scenarios cost 3 offline passes instead of 7
and the keygen fixture is disk-cached (tests/keycache.py)."""

import numpy as np
import pytest

from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.protocols.gg20 import blame

from keycache import cached_keygen, tile_key

BITS = 768


@pytest.fixture(scope="module")
def key_n2():
    return cached_keygen(0x51, 1, 1, 2, BITS)


def _matrix(key1, rng, s_parties, step, scenarios):
    """One batched offline (+online for step 7) over len(scenarios)
    sessions, session b corrupted at `step` with scenarios[b]; returns the
    per-session blame lists."""
    key = tile_key(key1, len(scenarios))
    if step == 7:
        off = gg20.offline_stage(key, s_parties, rng)
        assert off.ok.all()
        sig = gg20.sign_online(
            off, 0xDEAD_BEEF, corrupt={"step": 7, "parties": scenarios}
        )
        assert not sig.sig_valid.any()
        return blame.phase7_blame(off, sig.s_i, 0xDEAD_BEEF)
    off = gg20.offline_stage(
        key, s_parties, rng, corrupt={"step": step, "parties": scenarios}
    )
    assert not off.ok.any()
    if step == 5:
        return blame.phase5_blame(key, off)
    return blame.phase6_blame(key, off, rng)


@pytest.fixture(scope="module")
def n2_step5(key_n2):
    return _matrix(*key_n2, [0, 1], 5, [[0], [1], [0, 1]])


@pytest.fixture(scope="module")
def n2_step6(key_n2):
    return _matrix(*key_n2, [0, 1], 6, [[0], [1], [0, 1]])


# --- step 5 corruption (test.rs:70-101) -------------------------------------

def test_sign_n2_t1_ttag1_corrupt_step5_party1(n2_step5):
    assert n2_step5[0] == [0]


def test_sign_n2_t1_ttag1_corrupt_step5_party2(n2_step5):
    assert n2_step5[1] == [1]


def test_sign_n2_t1_ttag1_corrupt_step5_party12(n2_step5):
    assert n2_step5[2] == [0, 1]


# --- step 6 corruption (test.rs:103-134) ------------------------------------

def test_sign_n2_t1_ttag1_corrupt_step6_party1(n2_step6):
    assert n2_step6[0] == [0]


def test_sign_n2_t1_ttag1_corrupt_step6_party2(n2_step6):
    assert n2_step6[1] == [1]


def test_sign_n2_t1_ttag1_corrupt_step6_party12(n2_step6):
    assert n2_step6[2] == [0, 1]


# --- step 7 corruption (test.rs:136-148) ------------------------------------

def test_sign_n2_t1_ttag1_corrupt_step7_party2(key_n2):
    assert _matrix(*key_n2, [0, 1], 7, [[1]]) == [[1]]


# --- keygen-time policy: undersized Paillier modulus (test.rs:764-783) ------

def test_small_paillier_keygen_rejected_end_to_end():
    """A party presenting a half-width Paillier key passes its own proofs but
    MUST be flagged by the bit-length policy during keygen round 2."""
    from tpu_mpc.utils.rng import SessionRng

    rng = SessionRng(0x54)
    res = gg20.keygen(1, 1, 2, rng, paillier_bits=BITS, corrupt={"small_paillier": [1]})
    assert not res.ok.any()
    assert res.bad_actors[:, 1].all(), "undersized party not flagged"
    assert not res.bad_actors[:, 0].any(), "honest party wrongly flagged"
