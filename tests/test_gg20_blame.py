"""GG20 corrupt-and-blame on the 3-party key: phase-5/6/7 blame replays,
the decommit-corruption seam, forged phase-6 proofs, and proactive
refresh/rotation (gg_2020/test.rs corruption scenarios + party_i.rs
refresh).  Split from test_gg20.py (r5, compile-count threshold); shares
its disk-cached keygen fixture."""

import numpy as np
import pytest

from tpu_mpc.host import ec as hec
from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.protocols.gg20 import blame
from tpu_mpc.vss import feldman

from keycache import cached_keygen

BITS = 768
S = 2


@pytest.fixture(scope="module")
def keypair():
    return cached_keygen(0x20, S, 1, 3, BITS)


def test_corrupt_step5_blame(keypair):
    key, rng = keypair
    off = gg20.offline_stage(key, [0, 1], rng, corrupt={"step": 5, "parties": [1]})
    # R_dash sum check must fail (phase5_check_R_dash_sum)
    assert not off.ok.any()
    bad = blame.phase5_blame(key, off)
    assert bad == [[1]] * S, f"expected [[1]]*S, got {bad}"


def test_corrupt_step6_blame(keypair):
    key, rng = keypair
    off = gg20.offline_stage(key, [0, 2], rng, corrupt={"step": 6, "parties": [0]})
    assert not off.ok.any()  # sum S_i != y
    bad = blame.phase6_blame(key, off, rng)
    assert bad == [[0]] * S, f"expected [[0]]*S, got {bad}"


def test_corrupt_step7_blame(keypair):
    key, rng = keypair
    m = 1234512345
    off = gg20.offline_stage(key, [1, 2], rng)
    assert off.ok.all()
    sig = gg20.sign_online(off, m, corrupt={"step": 7, "parties": [1]})
    assert not sig.sig_valid.any()
    bad = blame.phase7_blame(off, sig.s_i, m)
    assert bad == [[1]] * S, f"expected [[1]]*S, got {bad}"


def test_refresh_and_update(keypair):
    """Proactive refresh ceremony (gg_2020/party_i.rs:459-523): zero-sum
    factors leave y invariant; VSS-dealt x-updates keep signing working."""
    key, rng = keypair
    n = key.n
    # zero-sum refresh factors per party
    f = np.asarray(rng.scalars((S, n)), dtype=object)
    f[:, n - 1] = np.vectorize(
        lambda tot: (-int(tot)) % hec.N, otypes=[object]
    )(np.sum(f[:, : n - 1], axis=1))
    key2 = gg20.refresh_private_key(key, f, rng)
    # y invariant under the zero-sum refresh
    from tpu_mpc.ec import secp256k1 as dec

    assert list(dec.points_to_host(key2.y)) == list(dec.points_to_host(key.y))
    assert (np.asarray(key2.p) != np.asarray(key.p)).all()  # fresh Paillier
    # each party re-deals its factor; x_j += sum_i share_{i,j}
    _, shares_f = feldman.share(key.t, n, f, rng)
    factor_x = np.mod(np.sum(shares_f, axis=1), hec.N)
    key2 = gg20.update_private_key(key2, np.zeros((S, n), dtype=object), factor_x)
    off = gg20.offline_stage(key2, [0, 2], rng)
    assert off.ok.all(), f"offline after refresh failed: {off.bad_actors}"
    sig = gg20.sign_online(off, 0xD00D5EED)
    assert sig.sig_valid.all()


def test_corrupt_decommit_blame(keypair):
    """A party that commits/decommits a fake g_gamma while using the real
    gamma in the MtA is identified by the phase-5 decommit re-check
    (blame.rs:126-141) — the MtA replay alone would clear it."""
    key, rng = keypair
    off = gg20.offline_stage(key, [0, 1], rng, corrupt={"step": "decommit", "parties": [1]})
    assert not off.ok.any()  # R is wrong -> R_dash sum check fails
    bad = blame.phase5_blame(key, off)
    assert bad == [[1]] * S, f"expected [[1]]*S, got {bad}"


def test_forged_phase6_proof_blamed(keypair):
    """phase6_blame consumes the accused parties' ECDDH proofs as INPUTS;
    a forged proof (produced with a wrong sigma_i) is detected and blamed
    (blame.rs:258-271, 396-414)."""
    import dataclasses

    key, rng = keypair
    off = gg20.offline_stage(key, [0, 1], rng)
    assert off.ok.all()
    # party 0 forges its phase-6 reveal: proves with 2*sigma_0
    forged_state = dataclasses.replace(off)
    forged_state.sigma_i = off.sigma_i.copy()
    forged_state.sigma_i[:, 0] = np.mod(off.sigma_i[:, 0] * 2, hec.N)
    proofs = blame.phase6_local_proofs(forged_state, rng)
    bad = blame.phase6_blame(key, off, rng, ecddh_proofs=proofs)
    assert bad == [[0]] * S, f"expected [[0]]*S, got {bad}"
