"""Golden fixtures pinning every serialization / challenge-derivation seam
(SURVEY §4 pattern 8; reference seams: a_with_predefined_randomness
mta/mod.rs:62,111, create_commitments_with_fixed_secret_share
lindell_2017/party_one.rs:179).

The Rust reference cannot execute in this environment (no cargo), so these
goldens are pinned from this implementation's own output: their job is to
make ANY future drift in byte encodings, Fiat-Shamir ordering, or challenge
derivation a loud test failure rather than a silent interop break.  Values
with an independent external definition (SEC1 compressed G, SHA-256 of known
byte strings) are true cross-implementation fixtures.
"""

import hashlib

import numpy as np

from tpu_mpc.host import ec as hec
from tpu_mpc.host.serde import Digest, bigint_to_bytes


# --- externally-defined constants (true cross-impl fixtures) ----------------

def test_generator_compression():
    """SEC1 compressed secp256k1 G — public standard constant."""
    assert hec.compress(hec.G).hex() == (
        "0279be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798"
    )


def test_base_point2():
    """curv base_point2: iterated SHA-256 lift_x from compressed G."""
    assert hec.compress(hec.BASE_POINT2).hex() == (
        "0208d13221e3a7326a34dd45214ba80116dd142e4b5ff3ce66a8dc7bfa0378b795"
    )


def test_bigint_serialization_convention():
    """curv BigInt -> minimal big-endian, 0 -> empty string."""
    assert bigint_to_bytes(0) == b""
    assert bigint_to_bytes(1) == b"\x01"
    assert bigint_to_bytes(0x0100) == b"\x01\x00"
    # digest of chained bigints == sha256 of the concatenated encodings
    assert Digest().chain_bigint(1, 2).result_bigint() == int.from_bytes(
        hashlib.sha256(b"\x01\x02").digest(), "big"
    )
    assert Digest().chain_bigint(0).result_bigint() == int.from_bytes(
        hashlib.sha256(b"").digest(), "big"
    )


# --- challenge-derivation goldens (drift detectors) -------------------------

N_FIX = (2**767 + 3**160 + 12345) | 1


def test_correct_key_challenge_derivation_pinned():
    """NiCorrectKeyProof rho_i derivation (KZen salt + mask_generation +
    primorial gcd) — pinned so the zk-paillier-compatible scheme cannot
    silently change (zk/paillier_zk.py docstring)."""
    from tpu_mpc.zk.paillier_zk import (
        ALPHA_PRIMORIAL,
        _SALT_BN,
        _sha256_bigints,
        correct_key_challenges,
    )

    assert _SALT_BN == int.from_bytes(b"KZen", "big")
    assert hex(_sha256_bigints(N_FIX, _SALT_BN, 0)) == (
        "0x32ec195315a0b37a1572f6406245ce823b495d70f7bf38a6f62e3b1dbd13c2bf"
    )
    ch = correct_key_challenges(N_FIX)
    assert len(ch) == 11
    assert hashlib.sha256(bigint_to_bytes(ch[0])).hexdigest() == (
        "7f86eb6997bfb858599cb66cbe4cd35fe143ecee026b43a1da89c804ee3b84f9"
    )
    assert hashlib.sha256(bigint_to_bytes(ch[10])).hexdigest() == (
        "7fa5d314d03bb3a6d3708d20f95e182d8bf37b771348cf77cce614f39c932d4e"
    )
    assert ALPHA_PRIMORIAL.bit_length() == 9095
    assert hashlib.sha256(bigint_to_bytes(ALPHA_PRIMORIAL)).hexdigest() == (
        "a12b37d71cb5c2d2bb918aed42fc08a422f8d854c4bb61a3328687804b506b7e"
    )


P_FIX = 0xE49FBB0E90F6BFF4CFEB4E54B9B737BC33DA9D188FE0F14F15F7C4C3A5F261E1AA2EF37343E7E1F7BE9C1A379FBAF44B5E31D68A1CEC93777EA0B1ADB18E64A3
Q_FIX = 0xD2E5B9A3C1D075DF5C46873C5B1EFF3E2B8C557F27A8A5B38F9D3B8A8FEB3F61F00F5C09C2E8D37B08F2B6DEA2D1DEB1A1BA4C6F0B7C5E9A3D2C1B0A9F8E7D55


def test_paillier_fixed_randomness_ciphertext():
    """Device-path Paillier encryption under fixed (n, m, r) vs the
    independent python-pow oracle AND a pinned hash (mta/mod.rs:62 seam)."""
    from tpu_mpc.mta.mta import paillier_encrypt_ints
    from tpu_mpc.zk.range_proofs import PaillierCtxBatch

    n = P_FIX * Q_FIX
    ek = PaillierCtxBatch.from_ints(np.asarray([n], dtype=object), bits=1024)
    m = 0x1122334455667788990011223344556677889900
    r = 0x0FEDCBA987654321 ** 7 % n
    c = int(paillier_encrypt_ints(ek, np.asarray([m], dtype=object), np.asarray([r], dtype=object))[0])
    assert c == ((1 + m * n) * pow(r, n, n * n)) % (n * n)
    assert hashlib.sha256(bigint_to_bytes(c)).hexdigest() == (
        "69108ba6b94b702866d6339dda7b6b070aad04c404d35995a8731f4424eeb514"
    )


def test_fiat_shamir_digest_rows_pinned():
    """digest_rows chaining order + encoding, pinned."""
    from tpu_mpc.hashes.fiat_shamir import digest_rows
    from tpu_mpc.mta.mta import paillier_encrypt_ints
    from tpu_mpc.zk.range_proofs import PaillierCtxBatch

    n = P_FIX * Q_FIX
    ek = PaillierCtxBatch.from_ints(np.asarray([n], dtype=object), bits=1024)
    m = 0x1122334455667788990011223344556677889900
    r = 0x0FEDCBA987654321 ** 7 % n
    c = paillier_encrypt_ints(ek, np.asarray([m], dtype=object), np.asarray([r], dtype=object))
    e = digest_rows(np.asarray([n], dtype=object), np.asarray([n + 1], dtype=object), c)
    assert hex(int(e[0])) == (
        "0xbe5563b439f0e7951414f73e83b6b94fbb8a0bd0718c55b33c4fecb72f410e4"
    )


def test_point_hash_encoding_matches_host_compress():
    """Device-path point_hash_ints == SEC1-compressed host encoding."""
    from tpu_mpc.ec import secp256k1 as dec
    from tpu_mpc.hashes.fiat_shamir import point_hash_ints

    ks = np.asarray([1, 2, 0xDEADBEEF], dtype=object)
    pts = dec.mul_generator(dec.sc_from_ints(ks))
    got = point_hash_ints(pts)
    for i, k in enumerate(ks):
        want = int.from_bytes(hec.compress(hec.mul(int(k))), "big")
        assert int(got[i]) == want


# --- end-to-end (r,s) goldens under pinned seeds -----------------------------

GG18_FIXTURE = {
    "seed": 0xF1C5,
    "bits": 768,
    "m": 0x5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A5A,
    "r": "b4f9d22448459561fea1fc4bdc0b4ad56b7aa869dd94cd892d666c35d019ee10",
    "s": "1ca4b748a30068e448cfe00cd7eb48c699362e970f5bde7d26b0e96c5ed5d380",
    "y": "0346bbb33426634a3fb0a943292322e94744854dd3e98e7b0b8d7e321366668a3b",
}


def test_gg18_full_signature_pinned():
    """Full GG18 keygen+sign under a pinned seed: (r,s) and pubkey must be
    byte-identical run over run (detects ANY drift in kernels, sampling
    order, or serialization), and verify under the OpenSSL oracle."""
    from tpu_mpc.ec import secp256k1 as dec
    from tpu_mpc.protocols.gg18 import batch as gg18
    from tpu_mpc.utils.rng import SessionRng

    rng = SessionRng(GG18_FIXTURE["seed"])
    res = gg18.keygen(1, 1, 2, rng, paillier_bits=GG18_FIXTURE["bits"])
    assert res.ok.all()
    sig = gg18.sign(res.key, [0, 1], GG18_FIXTURE["m"], rng)
    assert sig.ok.all() and sig.sig_valid.all()
    y = dec.points_to_host(res.key.y)[0]
    assert hec.ecdsa_verify_openssl(y, GG18_FIXTURE["m"], int(sig.r[0]), int(sig.s[0]))
    assert f"{int(sig.r[0]):064x}" == GG18_FIXTURE["r"]
    assert f"{int(sig.s[0]):064x}" == GG18_FIXTURE["s"]
    assert hec.compress(y).hex() == GG18_FIXTURE["y"]
