"""Differential tests for batched Montgomery multiply / modexp."""

import numpy as np
import jax.numpy as jnp

from tpu_mpc.core import montgomery as mont
from tpu_mpc.core.limbs import batch_from_limbs, batch_to_limbs, nlimbs


def odd_modulus(rng, bits):
    return ((1 << (bits - 1)) | rng.getrandbits(bits - 1)) | 1


def test_mont_mul_shared_modulus(rng):
    bits = 256
    L = nlimbs(bits)
    n_int = odd_modulus(rng, bits)
    ctx = mont.MontCtx.from_ints(n_int, bits)
    xs = [rng.getrandbits(bits) % n_int for _ in range(8)]
    ys = [rng.getrandbits(bits) % n_int for _ in range(8)]
    a = jnp.asarray(batch_to_limbs(xs, L))
    b = jnp.asarray(batch_to_limbs(ys, L))
    R = 1 << (16 * L)
    got = batch_from_limbs(np.asarray(mont.mont_mul(a, b, ctx)))
    want = [(x * y * pow(R, -1, n_int)) % n_int for x, y in zip(xs, ys)]
    assert [int(v) for v in got] == want


def test_mod_mul_and_roundtrip(rng):
    bits = 512
    L = nlimbs(bits)
    n_int = odd_modulus(rng, bits)
    ctx = mont.MontCtx.from_ints(n_int, bits)
    xs = [rng.getrandbits(bits) % n_int for _ in range(4)]
    ys = [rng.getrandbits(bits) % n_int for _ in range(4)]
    a = jnp.asarray(batch_to_limbs(xs, L))
    b = jnp.asarray(batch_to_limbs(ys, L))
    got = batch_from_limbs(np.asarray(mont.mod_mul(a, b, ctx)))
    assert [int(v) for v in got] == [(x * y) % n_int for x, y in zip(xs, ys)]
    back = batch_from_limbs(np.asarray(mont.from_mont(mont.to_mont(a, ctx), ctx)))
    assert [int(v) for v in back] == xs


def test_mont_exp_per_session_moduli(rng):
    bits = 256
    L = nlimbs(bits)
    ns = [odd_modulus(rng, bits) for _ in range(4)]
    ctx = mont.MontCtx.from_ints(ns, bits)
    xs = [rng.getrandbits(bits) % n for n in ns]
    es = [rng.getrandbits(bits) for _ in range(4)]
    a = jnp.asarray(batch_to_limbs(xs, L))
    e = jnp.asarray(batch_to_limbs(es, L))
    got = batch_from_limbs(np.asarray(mont.mont_exp(a, e, ctx, ebits=bits)))
    assert [int(v) for v in got] == [pow(x, ee, n) for x, ee, n in zip(xs, es, ns)]


def test_mont_exp_small_exponent_and_edges(rng):
    bits = 256
    L = nlimbs(bits)
    n_int = odd_modulus(rng, bits)
    ctx = mont.MontCtx.from_ints(n_int, bits)
    xs = [rng.getrandbits(bits) % n_int for _ in range(3)] + [0, 1]
    es = [0, 1, 2, 65537, 3]
    a = jnp.asarray(batch_to_limbs(xs, L))
    e = jnp.asarray(batch_to_limbs(es, nlimbs(32)))
    got = batch_from_limbs(np.asarray(mont.mont_exp(a, e, ctx, ebits=32)))
    assert [int(v) for v in got] == [pow(x, ee, n_int) for x, ee in zip(xs, es)]


def test_mont_exp_2048(rng):
    """One realistic Paillier-sized check (slowest test in this file)."""
    bits = 2048
    L = nlimbs(bits)
    n_int = odd_modulus(rng, bits)
    ctx = mont.MontCtx.from_ints(n_int, bits)
    x = rng.getrandbits(bits) % n_int
    e_int = rng.getrandbits(256)
    a = jnp.asarray(batch_to_limbs([x], L))
    e = jnp.asarray(batch_to_limbs([e_int], nlimbs(256)))
    got = int(batch_from_limbs(np.asarray(mont.mont_exp(a, e, ctx, ebits=256)))[0])
    assert got == pow(x, e_int, n_int)


def test_mod_inv_prime(rng):
    # secp256k1 base field prime
    p = 2**256 - 2**32 - 977
    bits = 256
    L = nlimbs(bits)
    ctx = mont.MontCtx.from_ints(p, bits)
    xs = [rng.getrandbits(255) % p for _ in range(3)]
    a = jnp.asarray(batch_to_limbs(xs, L))
    got = batch_from_limbs(np.asarray(mont.mod_inv_prime(a, ctx, p)))
    assert [int(v) for v in got] == [pow(x, -1, p) for x in xs]
