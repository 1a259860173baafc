"""GG20 adversarial matrix, large quorums (n=5 t=2 ttag=4 and n=8 t=4
ttag=6): the remaining corruption tests of gg_2020/test.rs:60-148.  Split
from test_gg20_adversarial.py (n=2) so the two kernel-shape families
compile in separate parallel processes.  Same batched-scenario pattern:
one offline launch per corruption step, sessions = scenarios."""

import numpy as np
import pytest

from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.protocols.gg20 import blame

from keycache import cached_keygen, tile_key

BITS = 768


@pytest.fixture(scope="module")
def key_n5():
    return cached_keygen(0x52, 1, 2, 5, BITS)


@pytest.fixture(scope="module")
def key_n8():
    return cached_keygen(0x53, 1, 4, 8, BITS)


def _matrix(key1, rng, s_parties, step, scenarios):
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
def n5_step5(key_n5):
    return _matrix(*key_n5, [0, 2, 3, 4], 5, [[0], [0, 3]])


@pytest.fixture(scope="module")
def n5_step6(key_n5):
    return _matrix(*key_n5, [0, 2, 3, 4], 6, [[0], [0, 3]])


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

def test_sign_n5_t2_ttag4_corrupt_step5_party1(n5_step5):
    assert n5_step5[0] == [0]


def test_sign_n5_t2_ttag4_corrupt_step5_party14(n5_step5):
    assert n5_step5[1] == [0, 3]


# --- step 6 corruption (test.rs:103-134) ------------------------------------

def test_sign_n5_t2_ttag4_corrupt_step6_party1(n5_step6):
    assert n5_step6[0] == [0]


def test_sign_n5_t2_ttag4_corrupt_step6_party14(n5_step6):
    assert n5_step6[1] == [0, 3]


# --- step 7 corruption (test.rs:136-148) ------------------------------------

def test_sign_n5_t2_ttag4_corrupt_step7_party24(key_n5):
    assert _matrix(*key_n5, [0, 2, 3, 4], 7, [[1, 3]]) == [[1, 3]]
