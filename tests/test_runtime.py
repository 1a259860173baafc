"""Runtime layer: state machines + simulation + relay transport.

Mirrors the reference's Simulation tests (state_machine/keygen.rs:493-527)
and the relay example flow (demo/run.sh), with small Paillier widths.
"""

import hashlib
import threading

import numpy as np
import pytest

from tpu_mpc.host import ec as hec
from tpu_mpc.runtime.gg20_keygen_sm import Gg20Keygen
from tpu_mpc.runtime.gg20_sign_sm import (
    Gg20OfflineStage,
    partial_sig_local,
    sign_manual,
)
from tpu_mpc.runtime.state_machine import run_simulation
from tpu_mpc.runtime.wire import Msg, decode_value, encode_value
from tpu_mpc.utils.rng import SessionRng

BITS = 768


def test_wire_roundtrip():
    body = {
        "round": 1,
        "big": 2**2047 + 12345,
        "pt": hec.mul(7),
        "vec": [1, 2, hec.mul(9)],
        "nested": {"x": 0},
    }
    m = Msg(2, None, body)
    back = Msg.from_json(m.to_json())
    assert back.sender == 2 and back.receiver is None
    assert back.body == body


@pytest.fixture(scope="module")
def keygen_outputs():
    machines = [Gg20Keygen(i, 1, 3, SessionRng(100 + i), paillier_bits=BITS) for i in (1, 2, 3)]
    bench = {}
    outs = run_simulation(machines, benchmarks=bench)
    # Simulation::enable_benchmarks analog: every round timed for every party
    assert sorted(bench) == [0, 1, 2, 3, 4]
    assert all(len(v) == 3 for v in bench.values())
    # progress repr (OfflineStageProgress analog, sign/fmt.rs:11-126)
    assert "finished" in repr(machines[0])
    return outs


def test_keygen_simulation(keygen_outputs):
    outs = keygen_outputs
    assert len(outs) == 3
    # all parties agree on y and pk_vec
    assert outs[0]["y"] == outs[1]["y"] == outs[2]["y"]
    assert outs[0]["pk_vec"] == outs[1]["pk_vec"]
    # y equals the sum of pk... x reconstruction via any 2 shares
    from tpu_mpc.vss import feldman

    rec = feldman.reconstruct([0, 1], [outs[0]["x_i"], outs[1]["x_i"]])
    assert hec.mul(rec) == outs[0]["y"]


def test_offline_and_online_signing(keygen_outputs):
    outs = keygen_outputs
    s_l = [0, 2]
    sms = [
        Gg20OfflineStage(1, s_l, outs[0], SessionRng(201)),
        Gg20OfflineStage(2, s_l, outs[2], SessionRng(202)),
    ]
    offline = run_simulation(sms)
    assert all(o is not None for o in offline)
    assert offline[0]["R"] == offline[1]["R"]
    digest = int.from_bytes(hashlib.sha256(b"sm message").digest(), "big")
    p1 = partial_sig_local(offline[0], digest)
    p2 = partial_sig_local(offline[1], digest)
    sig = sign_manual(offline[0], digest, [p2])
    assert sig["valid"], "signature must verify"
    sig2 = sign_manual(offline[1], digest, [p1])
    assert sig2 == sig


def test_relay_transport(keygen_outputs):
    """Offline signing across the HTTP relay (examples flow)."""
    from tpu_mpc.runtime import relay_client, relay_server

    server = relay_server.serve(port=18571)
    try:
        outs = keygen_outputs
        s_l = [0, 1]
        results = [None, None]

        def run(slot, local_i, key, seed):
            sm = Gg20OfflineStage(local_i, s_l, key, SessionRng(seed))
            results[slot] = relay_client.run_protocol(
                sm, "http://127.0.0.1:18571", "t-offline"
            )

        th = [
            threading.Thread(target=run, args=(0, 1, outs[0], 301)),
            threading.Thread(target=run, args=(1, 2, outs[1], 302)),
        ]
        [t.start() for t in th]
        [t.join(timeout=600) for t in th]
        assert all(r is not None for r in results)
        digest = 99887766554433221100
        p2 = partial_sig_local(results[1], digest)
        sig = sign_manual(results[0], digest, [p2])
        assert sig["valid"]
    finally:
        server.shutdown()


def test_round_blame_reports_missing():
    sm = Gg20Keygen(1, 1, 3, SessionRng(400), paillier_bits=BITS)
    assert sm.wants_to_proceed()
    assert "round 0" in repr(sm)
    sm.proceed()  # round 0 -> broadcasts M1, now waiting
    count, blamed = sm.round_blame()
    assert count == 2 and blamed == [2, 3]
    assert "[bc 0/2]*" in repr(sm)


def test_wire_level_blame_tampered_alice_proof(keygen_outputs):
    """Adversarial wire test: corrupt party 2's round-1 Alice range proof in
    transit; the receiving SM must abort with a ProtocolError blaming [2]
    (the deserialize-and-verify surface of blame.rs-style identification)."""
    from tpu_mpc.runtime.state_machine import ProtocolError

    outs = keygen_outputs
    s_l = [0, 1]
    sms = [
        Gg20OfflineStage(1, s_l, outs[0], SessionRng(501)),
        Gg20OfflineStage(2, s_l, outs[1], SessionRng(502)),
    ]

    def tamper(msg):
        if msg.sender == 2 and msg.body.get("round") == 1 and "alice_proofs" in msg.body:
            for pr in msg.body["alice_proofs"].values():
                pr["z"] = int(pr["z"]) ^ 1  # flip one bit of the commitment
        return msg

    with pytest.raises(ProtocolError) as exc:
        run_simulation(sms, tamper=tamper)
    assert exc.value.bad_actors == [2]
