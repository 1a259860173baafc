"""CLI drivers — gg20_keygen / gg20_signing (examples/gg20_keygen.rs:29-58,
examples/gg20_signing.rs:34-90).

  python -m tpu_mpc.runtime.cli keygen  -t 1 -n 3 -i 1 --output local1.json
  python -m tpu_mpc.runtime.cli sign    -p 1,2 -d hello --local-share local1.json

LocalKey is serialized to JSON (the reference's serde checkpoint,
gg20_keygen.rs:52-55) and reloaded for signing.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys

from .gg20_keygen_sm import Gg20Keygen
from .gg20_sign_sm import Gg20OfflineStage, partial_sig_local, scrub_offline, sign_manual
from .relay_client import SmClient, run_protocol
from .wire import Msg, decode_value, encode_value


def save_local_key(path: str, key: dict) -> None:
    with open(path, "w") as f:
        json.dump(encode_value(key), f)


def load_local_key(path: str) -> dict:
    with open(path) as f:
        return decode_value(json.load(f))


def cmd_keygen(args) -> None:
    sm = Gg20Keygen(args.index, args.threshold, args.number_of_parties,
                    paillier_bits=args.paillier_bits)
    out = run_protocol(sm, args.address, args.room)
    save_local_key(args.output, out)
    print(f"party {args.index}: keygen complete -> {args.output}")


def cmd_sign(args) -> None:
    key = load_local_key(args.local_share)
    parties = [int(p) for p in args.parties.split(",")]
    s_l = [p - 1 for p in parties]  # 0-based global indices
    local_i = parties.index(key["i"]) + 1
    digest = int.from_bytes(hashlib.sha256(args.data_to_sign.encode()).digest(), "big")

    sm = Gg20OfflineStage(local_i, s_l, key)
    off = run_protocol(sm, args.address, args.room + "-offline")

    # one-round online: broadcast partial sig, collect others
    client = SmClient(args.address, args.room + "-online")
    my_partial = partial_sig_local(off, digest)
    client.broadcast(Msg(local_i, None, {"round": 1, "s_i": my_partial}).to_json())
    partials = {}
    while len(partials) < len(parties) - 1:
        for raw in client.poll():
            m = Msg.from_json(raw)
            if m.sender != local_i:
                partials[m.sender] = m.body["s_i"]
    sig = sign_manual(off, digest, list(partials.values()))
    print(json.dumps({"r": format(sig["r"], "x"), "s": format(sig["s"], "x"),
                      "recid": sig["recid"], "valid": sig["valid"]}))
    if not sig["valid"]:
        sys.exit(1)
    scrub_offline(off)  # signature done: drop the one-time secrets


def main() -> None:
    ap = argparse.ArgumentParser(prog="tpu-mpc", description="GG20 threshold ECDSA CLI")
    sub = ap.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("keygen")
    kg.add_argument("-a", "--address", default="http://127.0.0.1:8000")
    kg.add_argument("-r", "--room", default="keygen")
    kg.add_argument("-i", "--index", type=int, required=True)
    kg.add_argument("-t", "--threshold", type=int, required=True)
    kg.add_argument("-n", "--number-of-parties", type=int, required=True)
    kg.add_argument("-o", "--output", required=True)
    kg.add_argument("--paillier-bits", type=int, default=2048)
    kg.set_defaults(func=cmd_keygen)

    sg = sub.add_parser("sign")
    sg.add_argument("-a", "--address", default="http://127.0.0.1:8000")
    sg.add_argument("-r", "--room", default="sign")
    sg.add_argument("-p", "--parties", required=True, help="e.g. 1,2")
    sg.add_argument("-d", "--data-to-sign", required=True)
    sg.add_argument("-l", "--local-share", required=True)
    sg.set_defaults(func=cmd_sign)

    args = ap.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
