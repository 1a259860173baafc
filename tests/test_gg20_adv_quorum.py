"""GG20 adversarial matrix, large quorums — honest signs (n=5 t=2 ttag=4
and n=8 t=4 ttag=6): gg_2020/test.rs:60-67.  The corruption steps live in
test_gg20_adv_quorum{5,6,7}.py: this jaxlib's CPU backend segfaults past
~30-40 accumulated fresh compiles per process, and the two quorum shape
families plus three blame phases in ONE process sit over that threshold
(r5 gate crash), so each phase compiles in its own process.  Keygens are
disk-cached (tests/fixtures/) so the split costs no keygen time."""

import pytest

from tpu_mpc.protocols.gg20 import batch as gg20

from keycache import cached_keygen

BITS = 768


@pytest.fixture(scope="module")
def key_n5():
    return cached_keygen(0x52, 1, 2, 5, BITS)


@pytest.fixture(scope="module")
def key_n8():
    return cached_keygen(0x53, 1, 4, 8, BITS)


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
