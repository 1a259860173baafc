"""GG20 adversarial matrix, large quorums, step-7 (online) corruption
(gg_2020/test.rs:136-148).  See test_gg20_adv_quorum.py for the split
rationale (per-process compile-count crash threshold)."""

from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.protocols.gg20 import blame

from keycache import cached_keygen, tile_key

BITS = 768


def test_sign_n5_t2_ttag4_corrupt_step7_party24():
    key1, rng = cached_keygen(0x52, 1, 2, 5, BITS)
    scenarios = [[1, 3]]
    key = tile_key(key1, len(scenarios))
    off = gg20.offline_stage(key, [0, 2, 3, 4], rng)
    assert off.ok.all()
    sig = gg20.sign_online(
        off, 0xDEAD_BEEF, corrupt={"step": 7, "parties": scenarios}
    )
    assert not sig.sig_valid.any()
    assert blame.phase7_blame(off, sig.s_i, 0xDEAD_BEEF) == [[1, 3]]
