"""Host (python-int) Paillier cryptosystem — golden oracle + keygen.

Mirrors kzen-paillier's API surface used by the reference
(/root/reference/src/utilities/mta/mod.rs:22-24,
 /root/reference/src/protocols/multi_party_ecdsa/gg_2020/blame.rs:252-256):
keypair / keypair_safe_primes / encrypt_with_chosen_randomness / decrypt /
open (randomness recovery) / add / mul.

Key generation is inherently host-side (prime search); the batched device
path for encrypt/decrypt/add/mul lives in tpu_mpc/paillier.
"""

from __future__ import annotations

import dataclasses
import random
import secrets

from . import primes


@dataclasses.dataclass(frozen=True)
class EncryptionKey:
    n: int

    @property
    def nn(self) -> int:
        return self.n * self.n


@dataclasses.dataclass(frozen=True)
class DecryptionKey:
    p: int
    q: int

    @property
    def n(self) -> int:
        return self.p * self.q

    @property
    def nn(self) -> int:
        return self.n * self.n

    @property
    def lam(self) -> int:  # lcm(p-1, q-1)
        import math

        return (self.p - 1) * (self.q - 1) // math.gcd(self.p - 1, self.q - 1)


def keypair(bits: int = 2048, rng: random.Random | None = None, safe: bool = False):
    """Paillier keypair with n of ~`bits` bits (two bits/2 primes).

    Like the reference default, non-safe primes (gg_2020/party_i.rs:138-140
    uses Paillier::keypair(), with a commented-out safe-prime variant).
    """
    gen = primes.gen_safe_prime if safe else primes.gen_prime
    while True:
        p = gen(bits // 2, rng)
        q = gen(bits // 2, rng)
        if p != q:
            break
    dk = DecryptionKey(p, q)
    return EncryptionKey(dk.n), dk


def sample_randomness(ek: EncryptionKey, rng: random.Random | None = None) -> int:
    """Uniform unit r in Z_n* (gcd check omitted: failure prob ~ 2^-1020)."""
    rand = rng.randrange if rng else (lambda a, b: secrets.randbelow(b - a) + a)
    return rand(1, ek.n)


def encrypt(ek: EncryptionKey, m: int, r: int) -> int:
    """E(m; r) = (1 + m n) r^n mod n^2   (g = n+1)."""
    n, nn = ek.n, ek.nn
    return (1 + m * n) % nn * pow(r, n, nn) % nn


def decrypt(dk: DecryptionKey, c: int) -> int:
    """CRT decryption (the device kernel mirrors this structure)."""
    p, q, n = dk.p, dk.q, dk.n
    lam = dk.lam
    u = pow(c, lam, dk.nn)
    l_val = (u - 1) // n
    return l_val * pow(lam, -1, n) % n


def add(ek: EncryptionKey, c1: int, c2: int) -> int:
    return c1 * c2 % ek.nn


def add_plain(ek: EncryptionKey, c: int, m: int) -> int:
    return c * (1 + m * ek.n) % ek.nn


def mul_plain(ek: EncryptionKey, c: int, k: int) -> int:
    return pow(c, k, ek.nn)


def open(dk: DecryptionKey, c: int) -> tuple[int, int]:
    """Recover (m, r) from a ciphertext (reference: Paillier::open,
    used by GG20 phase-6 blame, blame.rs:252-256).

    r = (c * g^{-m})^{n^{-1} mod lambda} mod n.
    """
    m = decrypt(dk, c)
    n = dk.n
    c_r = c * pow(1 + n, -m, dk.nn) % dk.nn  # strip the message part
    r = pow(c_r, pow(n, -1, dk.lam), n)
    return m, r
