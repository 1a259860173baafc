"""Differential tests: limb kernels vs python int (the golden oracle)."""

import numpy as np
import jax.numpy as jnp

from tpu_mpc.core import bigint as bi
from tpu_mpc.core.limbs import batch_from_limbs, batch_to_limbs, nlimbs


def rand_ints(rng, bits, k):
    return [rng.getrandbits(bits) for _ in range(k)]


def test_roundtrip(rng):
    L = nlimbs(2048)
    xs = rand_ints(rng, 2048, 8)
    a = batch_to_limbs(xs, L)
    back = batch_from_limbs(a)
    assert [int(v) for v in back] == xs


def test_carry_canon_random(rng):
    # random columns < 2^31 must canonicalize to the exact same value
    cols = np.array(
        [[rng.getrandbits(31) for _ in range(20)] for _ in range(6)], dtype=np.uint32
    )
    want = [sum(int(c) << (16 * i) for i, c in enumerate(row)) % (1 << (16 * 20)) for row in cols]
    got = batch_from_limbs(np.asarray(bi.carry_canon(jnp.asarray(cols))))
    assert [int(v) for v in got] == want


def test_carry_canon_worstcase():
    # a full run of 0xffff limbs with a generate at the bottom: the long ripple
    cols = np.full((1, 32), 0xFFFF, dtype=np.uint32)
    cols[0, 0] = 0x1FFFE  # generates a carry that must ripple to the top
    want = sum(int(c) << (16 * i) for i, c in enumerate(cols[0])) % (1 << (16 * 32))
    got = int(batch_from_limbs(np.asarray(bi.carry_canon(jnp.asarray(cols))))[0])
    assert got == want


def test_mul_small_and_large(rng):
    for bits in (256, 2048):
        L = nlimbs(bits)
        xs = rand_ints(rng, bits, 4)
        ys = rand_ints(rng, bits, 4)
        a = jnp.asarray(batch_to_limbs(xs, L))
        b = jnp.asarray(batch_to_limbs(ys, L))
        got = batch_from_limbs(np.asarray(bi.mul(a, b)))
        assert [int(v) for v in got] == [x * y for x, y in zip(xs, ys)]


def test_add_sub(rng):
    L = nlimbs(512)
    xs = rand_ints(rng, 512, 6)
    ys = rand_ints(rng, 512, 6)
    a = jnp.asarray(batch_to_limbs(xs, L))
    b = jnp.asarray(batch_to_limbs(ys, L))
    s = batch_from_limbs(np.asarray(bi.add(a, b)))
    assert [int(v) for v in s] == [x + y for x, y in zip(xs, ys)]
    d, ge = bi.sub(a, b)
    d = batch_from_limbs(np.asarray(d))
    for x, y, dv, g in zip(xs, ys, d, np.asarray(ge)):
        assert bool(g) == (x >= y)
        assert int(dv) == (x - y) % (1 << 512)


def test_mod_ops(rng):
    bits = 256
    L = nlimbs(bits)
    n_int = (1 << 255) + rng.getrandbits(254) | 1
    xs = [rng.getrandbits(255) % n_int for _ in range(5)]
    ys = [rng.getrandbits(255) % n_int for _ in range(5)]
    n = jnp.asarray(batch_to_limbs(n_int, L))
    a = jnp.asarray(batch_to_limbs(xs, L))
    b = jnp.asarray(batch_to_limbs(ys, L))
    s = batch_from_limbs(np.asarray(bi.mod_add(a, b, n)))
    assert [int(v) for v in s] == [(x + y) % n_int for x, y in zip(xs, ys)]
    d = batch_from_limbs(np.asarray(bi.mod_sub(a, b, n)))
    assert [int(v) for v in d] == [(x - y) % n_int for x, y in zip(xs, ys)]
    ng = batch_from_limbs(np.asarray(bi.mod_neg(a, n)))
    assert [int(v) for v in ng] == [(-x) % n_int for x in xs]


def test_bit_helpers(rng):
    L = nlimbs(256)
    x = rng.getrandbits(256)
    a = jnp.asarray(batch_to_limbs([x], L))
    for i in (0, 1, 15, 16, 17, 255):
        assert int(np.asarray(bi.get_bit(a, i))[0]) == (x >> i) & 1
    for k in (1, 7, 15):
        got = int(batch_from_limbs(np.asarray(bi.shift_right_bits(a, k)))[0])
        assert got == x >> k
