"""GG18 transport path: KV relay + polled clients + AES-GCM P2P shares.

Mirrors the reference's gg18 example flow (demo/run.sh): sm_manager KV store
(gg18_sm_manager.rs), keygen clients rounds 1-5 (gg18_keygen_client.rs),
sign clients rounds 0-9 (gg18_sign_client.rs), with small Paillier widths.
"""

import hashlib
import threading

import pytest

from tpu_mpc.host import ec as hec
from tpu_mpc.runtime import kv_server
from tpu_mpc.runtime.gg18_common import aes_decrypt, aes_encrypt, ecdh_aes_key
from tpu_mpc.runtime.gg18_keygen_client import keygen_run
from tpu_mpc.runtime.gg18_sign_client import sign_run
from tpu_mpc.utils.rng import SessionRng

BITS = 768
PORT = 18572
ADDR = f"http://127.0.0.1:{PORT}"


def test_aes_gcm_roundtrip_and_ecdh_symmetry():
    k1, k2 = 123456789, 987654321
    y1, y2 = hec.mul(k1), hec.mul(k2)
    # DH symmetry: k1 * y2 == k2 * y1
    assert ecdh_aes_key(k1, y2) == ecdh_aes_key(k2, y1)
    key = ecdh_aes_key(k1, y2)
    env = aes_encrypt(key, b"share bytes")
    assert aes_decrypt(key, env) == b"share bytes"
    with pytest.raises(Exception):
        aes_decrypt(ecdh_aes_key(k1, y1), env)  # wrong key must fail


@pytest.fixture(scope="module")
def gg18_keys():
    server = kv_server.serve(port=PORT, parties=3, threshold=1)
    try:
        results = [None, None, None]
        errs = []

        def run(slot):
            try:
                results[slot] = keygen_run(
                    ADDR, 3, 1, SessionRng(500 + slot), paillier_bits=BITS
                )
            except Exception as e:  # surface thread failures
                errs.append(e)

        th = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        [t.start() for t in th]
        [t.join(timeout=600) for t in th]
        assert not errs, errs
        assert all(r is not None for r in results)
        yield server, results
    finally:
        server.shutdown()


def test_gg18_keygen_clients(gg18_keys):
    _, keys = gg18_keys
    assert keys[0]["y"] == keys[1]["y"] == keys[2]["y"]
    # x_i are Feldman shares of sum(u_i): any 2 reconstruct the secret
    from tpu_mpc.vss import feldman

    by_party = {k["party_num"]: k for k in keys}
    rec = feldman.reconstruct([0, 1], [by_party[1]["x_i"], by_party[2]["x_i"]])
    assert hec.mul(rec) == keys[0]["y"]


def test_gg18_sign_clients(gg18_keys):
    _, keys = gg18_keys
    by_party = {k["party_num"]: k for k in keys}
    digest = int.from_bytes(hashlib.sha256(b"gg18 transport message").digest(), "big")
    results = [None, None]
    errs = []

    def run(slot, key, seed):
        try:
            results[slot] = sign_run(ADDR, key, digest, SessionRng(seed))
        except Exception as e:
            errs.append(e)

    th = [
        threading.Thread(target=run, args=(0, by_party[1], 601)),
        threading.Thread(target=run, args=(1, by_party[3], 602)),
    ]
    [t.start() for t in th]
    [t.join(timeout=600) for t in th]
    assert not errs, errs
    assert results[0] == results[1]
    sig = results[0]
    assert sig["valid"]
    assert hec.ecdsa_verify(keys[0]["y"], digest % hec.N, sig["r"], sig["s"])
