"""GG20 adversarial matrix, large quorums, step-5 corruption
(gg_2020/test.rs:70-101).  See test_gg20_adv_quorum.py for the split
rationale (per-process compile-count crash threshold)."""

import pytest

from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.protocols.gg20 import blame

from keycache import cached_keygen, tile_key

BITS = 768


@pytest.fixture(scope="module")
def n5_step5():
    key1, rng = cached_keygen(0x52, 1, 2, 5, BITS)
    scenarios = [[0], [0, 3]]
    key = tile_key(key1, len(scenarios))
    off = gg20.offline_stage(
        key, [0, 2, 3, 4], rng, corrupt={"step": 5, "parties": scenarios}
    )
    assert not off.ok.any()
    return blame.phase5_blame(key, off)


def test_sign_n5_t2_ttag4_corrupt_step5_party1(n5_step5):
    assert n5_step5[0] == [0]


def test_sign_n5_t2_ttag4_corrupt_step5_party14(n5_step5):
    assert n5_step5[1] == [0, 3]
