"""Device secp256k1 vs the pure-python host oracle."""

import numpy as np
import jax.numpy as jnp

from tpu_mpc.core.limbs import batch_from_limbs, batch_to_limbs
from tpu_mpc.ec import secp256k1 as ec
from tpu_mpc.host import ec as hec


def fe(xs):
    return jnp.asarray(batch_to_limbs(xs, ec.L))


def ints(a):
    return [int(v) for v in np.atleast_1d(batch_from_limbs(np.asarray(a)))]


def test_field_ops(rng):
    xs = [rng.getrandbits(256) % hec.P for _ in range(6)]
    ys = [rng.getrandbits(256) % hec.P for _ in range(6)]
    a, b = fe(xs), fe(ys)
    assert ints(ec.fe_mul(a, b)) == [x * y % hec.P for x, y in zip(xs, ys)]
    assert ints(ec.fe_add(a, b)) == [(x + y) % hec.P for x, y in zip(xs, ys)]
    assert ints(ec.fe_sub(a, b)) == [(x - y) % hec.P for x, y in zip(xs, ys)]
    assert ints(ec.fe_muli(a, 8)) == [x * 8 % hec.P for x in xs]
    assert ints(ec.fe_inv(a)) == [pow(x, -1, hec.P) for x in xs]
    # worst case: p-1 squared
    worst = fe([hec.P - 1])
    assert ints(ec.fe_mul(worst, worst)) == [(hec.P - 1) ** 2 % hec.P]


def test_scalar_ops(rng):
    xs = [rng.getrandbits(256) % hec.N for _ in range(4)]
    ys = [rng.getrandbits(256) % hec.N for _ in range(4)]
    a, b = fe(xs), fe(ys)
    assert ints(ec.sc_mul(a, b)) == [x * y % hec.N for x, y in zip(xs, ys)]
    assert ints(ec.sc_inv(a)) == [pow(x, -1, hec.N) for x in xs]
    assert ints(ec.sc_sub(a, b)) == [(x - y) % hec.N for x, y in zip(xs, ys)]


def test_point_add_double_edges(rng):
    k1, k2 = 12345, 67890
    P1 = ec.points_from_host([hec.mul(k1)])
    P2 = ec.points_from_host([hec.mul(k2)])
    # generic add
    got = ec.points_to_host(ec.point_add(P1, P2))[0]
    assert got == hec.mul(k1 + k2)
    # doubling through add (P + P)
    got = ec.points_to_host(ec.point_add(P1, P1))[0]
    assert got == hec.mul(2 * k1)
    # P + (-P) = infinity
    got = ec.points_to_host(ec.point_add(P1, ec.point_neg(P1)))[0]
    assert got is None
    # inf + Q = Q
    inf = ec.point_infinity((1,))
    got = ec.points_to_host(ec.point_add(inf, P2))[0]
    assert got == hec.mul(k2)
    # dedicated double
    got = ec.points_to_host(ec.point_double(P1))[0]
    assert got == hec.mul(2 * k1)


def test_scalar_mul_batch(rng):
    ks = [rng.getrandbits(256) % hec.N for _ in range(4)] + [1, 0]
    k = fe(ks)
    got = ec.points_to_host(ec.mul_generator(k))
    want = [hec.mul(kk) for kk in ks]
    for g, w in zip(got, want):
        assert g == w
    # scalar mul of a non-generator point
    base = hec.mul(999)
    B = ec.points_from_host([base] * len(ks))
    got = ec.points_to_host(ec.scalar_mul(k, B))
    for g, kk in zip(got, ks):
        assert g == hec.mul(999 * kk)


def test_point_eq_and_base_point2():
    P1 = ec.points_from_host([hec.mul(7)])
    P2 = ec.points_from_host([hec.mul(7)])
    P3 = ec.points_from_host([hec.mul(8)])
    assert bool(np.asarray(ec.point_eq(P1, P2))[0])
    assert not bool(np.asarray(ec.point_eq(P1, P3))[0])
    assert hec.is_on_curve(hec.BASE_POINT2)
    bp2 = ec.points_to_host(ec.base_point2((1,)))[0]
    assert bp2 == hec.BASE_POINT2


def test_x_coord_mod_q(rng):
    ks = [rng.getrandbits(256) % hec.N for _ in range(3)]
    R = ec.mul_generator(fe(ks))
    got = ints(ec.x_coord_mod_q(R))
    want = [hec.mul(kk)[0] % hec.N for kk in ks]
    assert got == want


def test_glv_constants():
    """Pin the GLV lattice algebra: lambda^2 + lambda + 1 = 0 mod q,
    beta^3 = 1 mod p, and a_i + b_i lambda = 0 mod q (libsecp constants)."""
    q, p = hec.N, hec.P
    lam, beta = ec.GLV_LAMBDA, ec.GLV_BETA
    assert (lam * lam + lam + 1) % q == 0
    assert pow(beta, 3, p) == 1
    a1, b2, nb1 = ec._GLV_B2, ec._GLV_B2, ec._GLV_NB1
    a2 = 0x114CA50F7A8E2F3F657C1108D9D44CFD8
    assert (a1 - nb1 * lam) % q == 0
    assert (a2 + b2 * lam) % q == 0
    assert a1 * b2 + a2 * nb1 == q  # basis determinant = q


def test_glv_scalar_mul_edges_and_random(rng):
    """GLV path vs the host oracle on adversarial-ish scalars: 0, 1, q-1,
    lambda itself, and random — plus the endomorphism identity
    lambda*P = (beta x, y)."""
    q = hec.N
    ks = [0, 1, 2, q - 1, ec.GLV_LAMBDA, q - ec.GLV_LAMBDA] + [
        rng.getrandbits(256) % q for _ in range(6)
    ]
    base = hec.mul(31337)
    P = ec.points_from_host([base] * len(ks))
    got = ec.points_to_host(ec.scalar_mul(fe(ks), P))
    for g, kk in zip(got, ks):
        assert g == (hec.mul(31337 * kk) if kk % q else None)
    lamP = ec.points_to_host(ec.scalar_mul(fe([ec.GLV_LAMBDA]), ec.points_from_host([base])))[0]
    assert lamP == (ec.GLV_BETA * base[0] % hec.P, base[1])


def test_dual_mul_matches_separate(rng):
    q = hec.N
    n = 5
    ka = [rng.getrandbits(256) % q for _ in range(n)]
    kb = [rng.getrandbits(256) % q for _ in range(n)] ; kb[0] = 0
    pa = [hec.mul(rng.getrandbits(128) | 1) for _ in range(n)]
    pb = [hec.mul(rng.getrandbits(128) | 1) for _ in range(n)]
    out = ec.dual_mul(
        fe(ka), ec.points_from_host(pa), fe(kb), ec.points_from_host(pb)
    )
    got = ec.points_to_host(out)
    for i in range(n):
        want = hec.add(hec.mul(ka[i], pa[i]) if ka[i] else None,
                       hec.mul(kb[i], pb[i]) if kb[i] else None)
        assert got[i] == want
