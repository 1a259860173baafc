"""Prime generation (host-side, data-dependent — stays off the TPU).

The reference gets this from GMP via kzen-paillier's `keypair()`
(/root/reference/src/protocols/multi_party_ecdsa/gg_2018/party_i.rs:151).
Prime search is a rejection loop, the one part of the stack that cannot be
constant-shape; it runs on host, optionally accelerated by the C++ helper in
tpu_mpc/native (Miller-Rabin over 1024-bit candidates).
"""

from __future__ import annotations

import random
import secrets

_SMALL_PRIMES: list[int] = []


def _small_primes(limit: int = 10000) -> list[int]:
    global _SMALL_PRIMES
    if not _SMALL_PRIMES:
        sieve = bytearray([1]) * limit
        sieve[0:2] = b"\x00\x00"
        for i in range(2, int(limit**0.5) + 1):
            if sieve[i]:
                sieve[i * i :: i] = b"\x00" * len(sieve[i * i :: i])
        _SMALL_PRIMES = [i for i in range(limit) if sieve[i]]
    return _SMALL_PRIMES


def is_probable_prime(n: int, rounds: int = 32, rng: random.Random | None = None) -> bool:
    if n < 2:
        return False
    for p in _small_primes():
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    rand = rng.randrange if rng else (lambda a, b: secrets.randbelow(b - a) + a)
    for _ in range(rounds):
        a = rand(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _native_gen_prime(bits: int, seed: int):
    try:
        from tpu_mpc.native import primegen  # lazy: optional C++ helper

        return primegen.gen_prime(bits, seed)
    except Exception:
        return None


def gen_prime(bits: int, rng: random.Random | None = None) -> int:
    """Random prime of exactly `bits` bits."""
    if rng is None:
        p = _native_gen_prime(bits, secrets.randbits(64))
        if p is not None:
            return p
        rng = random.Random(secrets.randbits(128))
    else:
        p = _native_gen_prime(bits, rng.getrandbits(64))
        if p is not None:
            return p
    while True:
        cand = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        if is_probable_prime(cand, rng=rng):
            return cand


def gen_primes_parallel(bits: int, count: int, rng: random.Random | None = None) -> list[int]:
    """Generate `count` primes concurrently across host cores.

    Seeds are drawn sequentially from `rng` (one 64-bit seed per prime, the
    exact draw order of repeated gen_prime calls — deterministic, so cached
    bench keys and pinned fixtures are unchanged); the search fans out over
    a thread pool.  The ctypes C++ helper releases the GIL during the call,
    so this scales with cores — prime generation dominates distributed
    keygen wall time (kzen-paillier keypair()'s GMP role)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    seeds = [
        rng.getrandbits(64) if rng else secrets.randbits(64) for _ in range(count)
    ]

    def one(seed: int) -> int:
        p = _native_gen_prime(bits, seed)
        if p is not None:
            return p
        r2 = random.Random(seed)  # per-seed fallback keeps parallel determinism
        while True:
            cand = r2.getrandbits(bits) | (1 << (bits - 1)) | 1
            if is_probable_prime(cand, rng=r2):
                return cand

    workers = min(count, os.cpu_count() or 1)
    if workers <= 1:
        return [one(s) for s in seeds]
    with ThreadPoolExecutor(workers) as ex:
        return list(ex.map(one, seeds))


def _native_gen_safe_prime(bits: int, seed: int):
    try:
        from tpu_mpc.native import primegen  # lazy: optional C++ helper

        return primegen.gen_safe_prime(bits, seed)
    except Exception:
        return None


def gen_safe_prime(bits: int, rng: random.Random | None = None) -> int:
    """Safe prime p = 2q+1 (reference: Paillier::keypair_safe_primes,
    gg_2018/party_i.rs:163-175).  Native double-sieved search when the C++
    helper is available; python fallback otherwise."""
    if rng is None:
        rng = random.Random(secrets.randbits(128))
    p = _native_gen_safe_prime(bits, rng.getrandbits(64))
    if p is not None:
        return p
    while True:
        q = gen_prime(bits - 1, rng)
        p = 2 * q + 1
        if is_probable_prime(p, rng=rng):
            return p


def gen_safe_primes_parallel(bits: int, count: int, rng: random.Random | None = None) -> list[int]:
    """`count` safe primes across host cores (see gen_primes_parallel for
    the seed-order determinism contract)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    seeds = [
        rng.getrandbits(64) if rng else secrets.randbits(64) for _ in range(count)
    ]

    def one(seed: int) -> int:
        p = _native_gen_safe_prime(bits, seed)
        if p is not None:
            return p
        r2 = random.Random(seed)
        while True:
            q = gen_prime(bits - 1, r2)
            cand = 2 * q + 1
            if is_probable_prime(cand, rng=r2):
                return cand

    workers = min(count, os.cpu_count() or 1)
    if workers <= 1:
        return [one(s) for s in seeds]
    with ThreadPoolExecutor(workers) as ex:
        return list(ex.map(one, seeds))
