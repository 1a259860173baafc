"""Interpreter-mode correctness gates for the Pallas EC kernels
(tpu_mpc/ec/pallas_ec.py) against the host EC oracle.

Runs the fused GLV ladder / dual ladder / 8-bit comb / affine kernels on
the CPU interpreter at a tiny tile so the exact kernel code path that TPU
executes is checked bit-for-bit (reference semantics:
curv secp256k1 Point/Scalar algebra, e.g. gg_2020/party_i.rs:627-633)."""

import numpy as np
import pytest

from tpu_mpc.ec import secp256k1 as ec
from tpu_mpc.ec import pallas_ec as pec
from tpu_mpc.host import ec as hec

B = 8
Q = hec.N


def _rand_scalars(rng, n=B, edge=()):
    ks = [int(x) for x in rng.integers(1, 1 << 62, n - len(edge))]
    ks = [k * 0x9E3779B97F4A7C15 % Q for k in ks]
    return list(edge) + ks


def _host_pts(P):
    return ec.points_to_host_list(P)


def _assert_pts(P, expected):
    got = _host_pts(P)
    assert got == list(expected)


def test_pallas_glv_mul_matches_host():
    rng = np.random.default_rng(11)
    ks = _rand_scalars(rng, edge=(0, 1, Q - 1))
    base_k = 0xB10C5
    base = hec.mul(base_k)
    kl = ec.sc_from_ints(np.asarray(ks, dtype=object))
    P = ec.points_from_host([base] * B)
    out = pec.glv_mul(kl, P)
    exp = [hec.mul(k, base) if k % Q else None for k in ks]
    _assert_pts(out, exp)


def test_pallas_glv_mul_infinity_base():
    kl = ec.sc_from_ints(np.asarray([5] * B, dtype=object))
    P = ec.points_from_host([None] * B)
    out = pec.glv_mul(kl, P)
    assert _host_pts(out) == [None] * B


def test_pallas_dual_mul_matches_host():
    rng = np.random.default_rng(12)
    ka = _rand_scalars(rng, edge=(0,))
    kb = _rand_scalars(rng, edge=(Q - 1,))
    A = hec.mul(0xA11CE)
    Bpt = hec.BASE_POINT2
    out = pec.dual_mul(
        ec.sc_from_ints(np.asarray(ka, dtype=object)),
        ec.points_from_host([A] * B),
        ec.sc_from_ints(np.asarray(kb, dtype=object)),
        ec.points_from_host([Bpt] * B),
    )
    exp = [hec.add(hec.mul(a, A), hec.mul(b, Bpt)) for a, b in zip(ka, kb)]
    _assert_pts(out, exp)


def test_pallas_comb_mul_matches_host():
    rng = np.random.default_rng(13)
    ks = _rand_scalars(rng, edge=(0, 1, Q - 1))
    out = pec.comb_mul(ec.sc_from_ints(np.asarray(ks, dtype=object)), hec.G)
    exp = [hec.mul(k) if k % Q else None for k in ks]
    _assert_pts(out, exp)


def test_pallas_affine_matches_host():
    rng = np.random.default_rng(14)
    ks = _rand_scalars(rng, edge=(7,))
    P = ec.mul_generator(ec.sc_from_ints(np.asarray(ks, dtype=object)))
    # scale into non-trivial Jacobian coords via a point_add round trip
    P2 = ec.point_add(P, ec.generator((B,)))
    x, y, inf = pec.affine(ec.Point(*(np.asarray(c) for c in P2)))
    from tpu_mpc.core.limbs import batch_from_limbs

    xs = batch_from_limbs(np.asarray(x))
    ys = batch_from_limbs(np.asarray(y))
    for i, k in enumerate(ks):
        exp = hec.add(hec.mul(k), hec.G)
        assert not bool(np.asarray(inf)[i])
        assert (int(xs[i]), int(ys[i])) == exp


def test_pallas_affine_infinity_rows():
    P = ec.points_from_host([None, hec.G] * (B // 2))
    x, y, inf = pec.affine(P)
    infs = np.asarray(inf)
    assert list(infs) == [True, False] * (B // 2)
    assert int(np.asarray(x)[0].sum()) == 0
