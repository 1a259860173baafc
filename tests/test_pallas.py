"""Pallas fused-RNS kernel numerics vs python pow(), in interpreter mode
on CPU (TPU_MPC_PALLAS=1 forces the pallas dispatch; interpret=True is
automatic off-TPU).  Kept tiny — interpreter mode executes every VPU op in
Python — the production widths are exercised on real TPU by bench.py and
benches/modexp_bench.py."""

import os

import numpy as np
import pytest

os.environ["TPU_MPC_PALLAS"] = "1"

from tpu_mpc.core import rns
from tpu_mpc.core.rns import RnsCtx

NBITS = 256


@pytest.fixture(scope="module")
def setup():
    r = np.random.RandomState(7)
    rand = lambda bits: int.from_bytes(r.bytes(bits // 8), "little")
    ns = np.asarray(
        [rand(NBITS) | 1 | (1 << (NBITS - 1)) for _ in range(3)], dtype=object
    )
    return r, rand, ns, RnsCtx.from_ints(ns, NBITS)


def test_pallas_exp_matches_pow(setup):
    r, rand, ns, ctx = setup
    bases = np.asarray([rand(NBITS) >> 1 for _ in range(3)], dtype=object)
    exps = np.asarray([rand(16) | 1 for _ in range(3)], dtype=object)
    got = rns.rns_exp_dispatch(ctx, ns, bases, exps, 16).ints()
    want = np.asarray(
        [pow(int(b), int(e), int(n)) for b, e, n in zip(bases, exps, ns)],
        dtype=object,
    )
    assert (got == want).all()


def test_pallas_reduce_axis0(setup):
    r, rand, ns, ctx = setup
    n0 = int(ns[0])
    ctx0 = RnsCtx.from_ints(ns[:1], NBITS)
    b = np.asarray([[rand(NBITS) % n0] for _ in range(3)], dtype=object)
    e = np.asarray([[rand(16) | 1] for _ in range(3)], dtype=object)
    got = rns.rns_exp_dispatch(
        ctx0, ns[:1], b, e, 16, reduce_axis0=True
    ).ints()
    want = 1
    for bb, ee in zip(b[:, 0], e[:, 0]):
        want = want * pow(int(bb), int(ee), n0) % n0
    assert int(got[0, 0]) == want


def test_pallas_reduce_axis0_trailing_moduli(setup):
    """Moduli constant along axis 0 but DIFFERENT along a trailing dim (the
    packed per-alice MtA verify shape): the reduced output keeps one modulus
    per trailing slot.  Regression: _finish_reduce used to collapse the ctx
    to flat element [0], silently failing every batched-verify equation on
    the pallas path."""
    r, rand, ns, _ = setup
    ctx2 = RnsCtx.from_ints(ns[None, :2], NBITS)  # [1, 2] trailing moduli
    S = 4
    b = np.asarray(
        [[rand(NBITS - 2) for _ in range(2)] for _ in range(S)], dtype=object
    )
    e = np.asarray([[rand(8) | 1 for _ in range(2)] for _ in range(S)],
                   dtype=object)
    got = rns.rns_exp_dispatch(
        ctx2, ns[None, :2], b, e, 8, reduce_axis0=True
    ).ints()
    for j in range(2):
        want = 1
        for s in range(S):
            want = want * pow(int(b[s, j]), int(e[s, j]), int(ns[j])) % int(ns[j])
        assert int(got[0, j]) == want


def test_pallas_fixed_prod(setup):
    r, rand, ns, ctx = setup
    n0 = int(ns[0])
    ctx1 = RnsCtx.from_ints(ns[:1], NBITS)
    g = np.asarray([[rand(NBITS) % n0]], dtype=object)
    tabs = rns.rns_make_tables(ctx1, ns[:1], g, 8, NBITS)
    e = np.asarray([rand(8) | 1 for _ in range(2)], dtype=object)
    got = rns.rns_fixed_prod_dispatch(ctx1, ns[:1], tabs, [e], [8], NBITS).ints()
    want = np.asarray(
        [pow(int(g[0, 0]), int(ee), n0) for ee in e], dtype=object
    )
    assert (got == want).all()


def test_pallas_fixed_prod_gmap(setup):
    """Group-compressed tables: G=2 distinct (modulus, base) groups serve
    S=4 interleaved sessions through an explicit gmap row map."""
    r, rand, ns, _ = setup
    G, S = 2, 4
    nsG = ns[:G]
    ctxG = RnsCtx.from_ints(nsG, NBITS)
    bases = np.asarray(
        [[rand(NBITS) % int(n) for n in nsG]], dtype=object
    )  # [1 base, G]
    tabs = rns.rns_make_tables(ctxG, nsG, bases, 8, NBITS)
    gmap = np.tile(np.arange(G), S // G)            # session s -> s % G
    n_s = np.asarray([int(nsG[i]) for i in gmap], dtype=object)
    ctx_s = RnsCtx.from_ints(n_s, NBITS)
    e = np.asarray([rand(8) | 1 for _ in range(S)], dtype=object)
    got = rns.rns_fixed_prod_dispatch(
        ctx_s, n_s, tabs, [e], [8], NBITS, gmap=gmap
    ).ints()
    want = np.asarray(
        [pow(int(bases[0, gmap[s]]), int(e[s]), int(n_s[s])) for s in range(S)],
        dtype=object,
    )
    assert (got == want).all()
