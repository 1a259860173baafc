"""GG18 client transport helpers — broadcast / sendp2p / poll + AES-GCM.

Behavioral equivalent of /root/reference/examples/common.rs:53-190:
  * broadcast(party, round, data)      key = "{party}-{round}-{uuid}"
  * sendp2p(from, to, round, data)     key = "{from}-{to}-{round}-{uuid}"
  * poll_for_broadcasts / poll_for_p2p spin on /get until all peers posted
  * aes_encrypt / aes_decrypt          AES-256-GCM for P2P VSS shares under
    pairwise ECDH-derived keys (common.rs:53-79); unlike the reference we
    carry a random 96-bit nonce in the envelope instead of a fixed one.

Payloads are JSON strings produced with wire.encode_value (ints as hex,
points as SEC1-compressed hex), stored as KV values on the GG18 relay
(kv_server.py).
"""

from __future__ import annotations

import json
import os
import time
import urllib.request

from cryptography.hazmat.primitives.ciphers.aead import AESGCM

from .wire import decode_value, encode_value


class KvClient:
    def __init__(self, address: str):
        self.base = address.rstrip("/")

    def _post(self, path: str, body: dict) -> dict:
        req = urllib.request.Request(
            self.base + "/" + path,
            data=json.dumps(body).encode(),
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read())

    def signup_keygen(self) -> tuple[int, str]:
        out = self._post("signupkeygen", {})["Ok"]
        return out["number"], out["uuid"]

    def signup_sign(self) -> tuple[int, str]:
        out = self._post("signupsign", {})["Ok"]
        return out["number"], out["uuid"]

    def set(self, key: str, value: str) -> None:
        self._post("set", {"key": key, "value": value})

    def get(self, key: str):
        out = self._post("get", {"key": key})
        return out["Ok"]["value"] if out.get("Ok") else None


def broadcast(client: KvClient, party_num: int, round_name: str, data: dict,
              uuid: str) -> None:
    """common.rs:104-116 — broadcast entry under {party}-{round}-{uuid}."""
    client.set(f"{party_num}-{round_name}-{uuid}", json.dumps(encode_value(data)))


def sendp2p(client: KvClient, party_from: int, party_to: int, round_name: str,
            data: dict, uuid: str) -> None:
    """common.rs:118-132 — P2P entry under {from}-{to}-{round}-{uuid}."""
    client.set(f"{party_from}-{party_to}-{round_name}-{uuid}", json.dumps(encode_value(data)))


def poll_for_broadcasts(client: KvClient, party_num: int, n: int, round_name: str,
                        uuid: str, delay: float = 0.05, timeout: float = 600.0) -> dict:
    """common.rs:134-161 — wait for every *other* party's broadcast.
    Returns {party_j: payload} for j != party_num."""
    out = {}
    deadline = time.time() + timeout
    for j in range(1, n + 1):
        if j == party_num:
            continue
        key = f"{j}-{round_name}-{uuid}"
        while True:
            v = client.get(key)
            if v is not None:
                out[j] = decode_value(json.loads(v))
                break
            if time.time() > deadline:
                raise TimeoutError(f"poll_for_broadcasts: {key}")
            time.sleep(delay)
    return out


def poll_for_p2p(client: KvClient, party_num: int, n: int, round_name: str,
                 uuid: str, delay: float = 0.05, timeout: float = 600.0) -> dict:
    """common.rs:163-190 — wait for every other party's P2P message to us."""
    out = {}
    deadline = time.time() + timeout
    for j in range(1, n + 1):
        if j == party_num:
            continue
        key = f"{j}-{party_num}-{round_name}-{uuid}"
        while True:
            v = client.get(key)
            if v is not None:
                out[j] = decode_value(json.loads(v))
                break
            if time.time() > deadline:
                raise TimeoutError(f"poll_for_p2p: {key}")
            time.sleep(delay)
    return out


def ecdh_aes_key(scalar: int, peer_point) -> bytes:
    """Pairwise AES key = x-coordinate of scalar * peer_y
    (gg18_keygen_client.rs:114-123 uses the same DH construction)."""
    from ..host import ec as hec

    shared = hec.mul(scalar % hec.N, peer_point)
    return (shared[0] % (1 << 256)).to_bytes(32, "big")


def aes_encrypt(key: bytes, plaintext: bytes) -> dict:
    """AES-256-GCM; envelope carries nonce + ciphertext||tag (common.rs:53-66)."""
    nonce = os.urandom(12)
    ct = AESGCM(key).encrypt(nonce, plaintext, None)
    return {"nonce": nonce.hex(), "ciphertext": ct.hex()}

def aes_decrypt(key: bytes, env: dict) -> bytes:
    return AESGCM(key).decrypt(bytes.fromhex(env["nonce"]), bytes.fromhex(env["ciphertext"]), None)
