"""Differential tests for the RNS Montgomery modexp kernel (core/rns.py) —
the MXU path.  Checked against python pow() over random and edge inputs,
both dot implementations, per-session moduli, and the production width."""

import random

import numpy as np
import pytest

import tpu_mpc.core.rns as rns
from tpu_mpc.core.rns import RnsCtx, RnsParams, rns_exp


@pytest.fixture(autouse=True)
def _restore_dot():
    prev = rns.DOT_IMPL
    yield
    rns.DOT_IMPL = prev


def _moduli(r, bits, B):
    return np.asarray(
        [(r.getrandbits(bits) | (1 << (bits - 1)) | 1) for _ in range(B)], dtype=object
    )


@pytest.mark.parametrize("dot", ["s8", "f32"])
def test_rns_exp_differential_256(dot):
    rns.DOT_IMPL = dot
    r = random.Random(0xA1)
    bits, B = 256, 4
    ns = _moduli(r, bits, B)
    ctx = RnsCtx.from_ints(ns, bits)
    xs = np.asarray([r.getrandbits(bits) % int(n) for n in ns], dtype=object)
    es = np.asarray([r.getrandbits(256) for _ in range(B)], dtype=object)
    es[0] = 0  # exponent-zero edge
    xs[1] = 0  # base-zero edge
    got = rns_exp(ctx, ns, xs, es, 256)
    for g, x, e, n in zip(got, xs, es, ns):
        assert int(g) == pow(int(x), int(e), int(n))


def test_rns_exp_wide_exponent_512():
    r = random.Random(0xB2)
    bits, B = 512, 3
    ns = _moduli(r, bits, B)
    ctx = RnsCtx.from_ints(ns, bits)
    xs = np.asarray([r.getrandbits(bits) % int(n) for n in ns], dtype=object)
    es = np.asarray(
        [(1 << 512) - 1, (1 << 511) | 1, r.getrandbits(64)], dtype=object
    )  # all-ones / top-bit edges
    got = rns_exp(ctx, ns, xs, es, 512)
    for g, x, e, n in zip(got, xs, es, ns):
        assert int(g) == pow(int(x), int(e), int(n))


def test_rns_params_margins():
    for bits in (256, 512, 1024, 2048):
        par = RnsParams(bits)
        assert par.MA > 4 * (par.K + 2) << bits
        assert par.MB > par.lam << bits
        assert int(par.rA.max()) < (1 << 13) and int(par.rB.max()) < (1 << 13)


@pytest.mark.slow
def test_rns_exp_production_width():
    """2048-bit modulus, 2048-bit exponent — the Paillier hot class."""
    r = random.Random(0xC3)
    bits, B = 2048, 2
    ns = _moduli(r, bits, B)
    ctx = RnsCtx.from_ints(ns, bits)
    xs = np.asarray([r.getrandbits(bits) % int(n) for n in ns], dtype=object)
    es = np.asarray([r.getrandbits(2048) for _ in range(B)], dtype=object)
    got = rns_exp(ctx, ns, xs, es, 2048)
    for g, x, e, n in zip(got, xs, es, ns):
        assert int(g) == pow(int(x), int(e), int(n))


def test_rns_ctx_propagates_through_views(monkeypatch):
    """take/tile/expand views must reuse the root's RNS constants (no host
    re-derivation) and still compute correct powers on derived shapes."""
    from tpu_mpc.core import modctx as m

    monkeypatch.setattr(m, "_RNS_ENV", "1")  # force the RNS policy on (CPU)
    r = random.Random(0xB2)
    ns = _moduli(r, 256, 2).reshape(1, 2)
    ctx = m.ModCtx.from_ints(ns, 256)
    assert ctx._rns is not None
    tiled = ctx.tile(3)                   # [3, 2]
    taken = tiled.take([1], axis=1)       # [3, 1]
    exp = taken.expand(1)                 # [3, 1, 1]
    for d in (tiled, taken, exp):
        assert d._rns is not None
    base = np.asarray([[3, 5], [7, 11], [13, 17]], dtype=object)
    e = np.asarray(7, dtype=object)
    got = tiled.pow(base, e, ebits_hint=3)
    for i in range(3):
        for j in range(2):
            assert int(got[i, j]) == pow(int(base[i, j]), 7, int(ns[0, j]))
    # derived-with-expand path: broadcast ctx [3,1,1] against operands [3,1,2]
    base2 = np.asarray([[[3, 4]], [[5, 6]], [[7, 8]]], dtype=object)
    got2 = exp.pow(base2, e, ebits_hint=3)
    for i in range(3):
        for j in range(2):
            assert int(got2[i, 0, j]) == pow(int(base2[i, 0, j]), 7, int(ns[0, 1]))


def test_rns_exp_reduce_axis0():
    """reduce_axis0: prod_s x_s^{e_s} over the leading axis, device-reduced
    (the cross-session batch-verify reduction) — vs python pow/prod, with
    a shared modulus along axis 0 and odd/even S."""
    r = random.Random(0xED)
    bits = 256
    for S in (5, 8):
        mods = _moduli(r, bits, 2)                       # [2] distinct
        n = np.broadcast_to(mods, (1, 2))                # shared along axis 0
        ctx = RnsCtx.from_ints(n, bits)
        ctx0 = ctx.map_batch(lambda a: a[:1])
        xs = np.asarray(
            [[r.getrandbits(bits) for _ in range(2)] for _ in range(S)], dtype=object
        )
        es = np.asarray(
            [[r.getrandbits(128) for _ in range(2)] for _ in range(S)], dtype=object
        )
        lz = rns.rns_exp_dispatch(ctx0, n[:1], xs, es, 128, reduce_axis0=True)
        got = lz.ints()
        assert got.shape == (1, 2)
        for j in range(2):
            m = int(mods[j])
            want = 1
            for s in range(S):
                want = want * pow(int(xs[s, j]), int(es[s, j]), m) % m
            assert int(got[0, j]) == want, (S, j)
