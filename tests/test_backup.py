"""Verifiable share backup (centipede Msegmentation analog) + key
rotation/update (reference: gg_2018/party_i.rs:326-381, gg_2020/party_i.rs:
459-523, centipede juggling)."""

import numpy as np

from tpu_mpc.host import backup, ec as hec
from tpu_mpc.utils.rng import SessionRng

N = hec.N


def test_segment_assemble_roundtrip():
    rng = SessionRng(31)
    for _ in range(4):
        s = int(rng.scalars(()))
        segs = backup.segment_secret(s, 16, 16)
        assert backup.assemble_segments(segs, 16) == s


def test_encrypted_segments_recover():
    rng = SessionRng(32)
    y_sk = int(rng.scalars(()))
    pub_y = hec.mul(y_sk)
    secret = int(rng.scalars(()))
    wit, enc = backup.to_encrypted_segments(secret, 16, 16, pub_y, rng)
    assert backup.assemble_segments(wit.x_vec, 16) == secret
    rec = backup.decrypt_segments(enc, y_sk, 16)
    assert rec == secret


def test_recover_wrong_key_fails():
    rng = SessionRng(33)
    y_sk = int(rng.scalars(()))
    pub_y = hec.mul(y_sk)
    secret = int(rng.scalars(()))
    _, enc = backup.to_encrypted_segments(secret, 16, 16, pub_y, rng)
    rec = backup.decrypt_segments(enc, y_sk + 1, 16)
    # wrong backup key: segments fall outside the 16-bit dlog window (whp)
    assert rec != secret


def test_gg18_update_and_refresh():
    from tpu_mpc.protocols.gg18 import batch as gg18
    from tpu_mpc.vss import feldman
    from tpu_mpc.ec import secp256k1 as dec

    rng = SessionRng(34)
    res = gg18.keygen(1, 1, 2, rng, paillier_bits=512)
    key = res.key

    # update with zero-sum factors keeps y invariant (proactive refresh)
    f = rng.scalars((1, 1))
    factors_u = np.concatenate([f, np.mod(-f, N)], axis=1)
    upd = gg18.update_private_key(key, factors_u, np.zeros((1, 2), dtype=object))
    assert bool(np.asarray(dec.point_eq(upd.y, key.y))[0])
    assert int(np.mod(np.sum(upd.u, axis=1), N)[0]) == int(np.mod(np.sum(key.u, axis=1), N)[0])

    # refresh regenerates Paillier keys and shifts u
    ref = gg18.refresh_private_key(key, factors_u, rng)
    assert bool(np.asarray(dec.point_eq(ref.y, key.y))[0])
    assert int(ref.ek.n[0, 0]) != int(key.ek.n[0, 0])

    # share backup of u_i then recovery
    y_sk = int(rng.scalars(()))
    pub_y = hec.mul(y_sk)
    wits, encs = gg18.to_encrypted_segments(key, 16, 16, pub_y, rng)
    got = backup.recover_batch(encs, y_sk, 16)
    want = np.asarray(key.u, dtype=object).reshape(-1)
    assert [int(a) for a in got] == [int(b) for b in want]
