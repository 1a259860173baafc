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


def test_mont_exp_prod_mixed_widths(rng):
    """Straus shared-squaring product vs pow(): mixed exponent widths incl.
    zero exponents and staging boundaries (ADVICE r1 item 4)."""
    bits = 256
    L = nlimbs(bits)
    ns = [odd_modulus(rng, bits) for _ in range(4)]
    ctx = mont.MontCtx.from_ints(ns, bits)
    xs1 = [rng.getrandbits(bits) % n for n in ns]
    xs2 = [rng.getrandbits(bits) % n for n in ns]
    for eb1, eb2 in [(256, 256), (64, 256), (16, 256), (256, 16)]:
        es1 = [rng.getrandbits(eb1) for _ in range(4)]
        es2 = [rng.getrandbits(eb2) for _ in range(4)]
        es1[0] = 0  # zero exponent edge
        got = batch_from_limbs(np.asarray(mont.mont_exp_prod(
            (jnp.asarray(batch_to_limbs(xs1, L)), jnp.asarray(batch_to_limbs(xs2, L))),
            (jnp.asarray(batch_to_limbs(es1, nlimbs(eb1))),
             jnp.asarray(batch_to_limbs(es2, nlimbs(eb2)))),
            ctx, ebits_list=(eb1, eb2),
        )))
        want = [pow(a, e1, n) * pow(b, e2, n) % n
                for a, b, e1, e2, n in zip(xs1, xs2, es1, es2, ns)]
        assert [int(v) for v in got] == want, (eb1, eb2)


def test_mont_exp_prod_class_boundary_exponents(rng):
    """Exponents exactly at an EBITS class boundary (all-ones top window)."""
    bits = 256
    L = nlimbs(bits)
    n_int = odd_modulus(rng, bits)
    ctx = mont.MontCtx.from_ints(n_int, bits)
    xs = [rng.getrandbits(bits) % n_int for _ in range(3)]
    es = [(1 << 256) - 1, (1 << 255) | 1, 1]
    got = batch_from_limbs(np.asarray(mont.mont_exp_prod(
        (jnp.asarray(batch_to_limbs(xs, L)),),
        (jnp.asarray(batch_to_limbs(es, nlimbs(256))),),
        ctx, ebits_list=(256,),
    )))
    assert [int(v) for v in got] == [pow(x, e, n_int) for x, e in zip(xs, es)]


def test_fixed_table_and_fixed_prod(rng):
    """make_fixed_table + mont_exp_fixed_prod vs pow(): the zero-squaring
    fixed-base path now wired into the ring-Pedersen call sites."""
    bits = 512
    L = nlimbs(bits)
    ns = [odd_modulus(rng, bits) for _ in range(2)]
    ctx = mont.MontCtx.from_ints(ns, bits)
    h1 = [rng.getrandbits(bits) % n for n in ns]
    h2 = [rng.getrandbits(bits) % n for n in ns]
    max_eb = 768
    nw = -(-max_eb // 4)
    t1 = mont.make_fixed_table(jnp.asarray(batch_to_limbs(h1, L)), ctx, nw)
    t2 = mont.make_fixed_table(jnp.asarray(batch_to_limbs(h2, L)), ctx, nw)
    for eb1, eb2 in [(768, 768), (256, 768), (768, 16), (16, 16)]:
        es1 = [rng.getrandbits(eb1) for _ in range(2)]
        es2 = [0, rng.getrandbits(eb2)]  # zero exponent edge
        got = batch_from_limbs(np.asarray(mont.mont_exp_fixed_prod(
            (t1, t2),
            (jnp.asarray(batch_to_limbs(es1, nlimbs(eb1))),
             jnp.asarray(batch_to_limbs(es2, nlimbs(eb2)))),
            ctx, ebits_list=(eb1, eb2),
        )))
        want = [pow(a, e1, n) * pow(b, e2, n) % n
                for a, b, e1, e2, n in zip(h1, h2, es1, es2, ns)]
        assert [int(v) for v in got] == want, (eb1, eb2)


def test_modctx_pow_fixed_prod_scalar_path(rng):
    """ModCtx.make_tables + pow_fixed_prod on the 0-d (single-session) path
    must agree with pow_prod and host pow()."""
    from tpu_mpc.core.modctx import ModCtx

    bits = 512
    n_int = odd_modulus(rng, bits)
    mc = ModCtx.from_ints(n_int, bits)
    h1, h2 = rng.getrandbits(bits) % n_int, rng.getrandbits(bits) % n_int
    tab = mc.make_tables(np.asarray([h1, h2], dtype=object), max_ebits=768)
    e1, e2 = rng.getrandbits(256), rng.getrandbits(768)
    got = mc.pow_fixed_prod((tab[:, :, 0], tab[:, :, 1]),
                            [np.asarray(e1, object), np.asarray(e2, object)],
                            ebits_hints=(256, 768))
    want = pow(h1, e1, n_int) * pow(h2, e2, n_int) % n_int
    assert int(got) == want  # 0-d path returns a bare python int
