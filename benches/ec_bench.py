"""EC kernel microbenchmark: scalar_mul / dual_mul / comb G-mul / to_affine.

Measures the per-launch rate of the four dominant EC blocks of the r5 sign
profile (ec:smul 16 s, ec:mulG 11 s, ec:affine+hashpts 7.6 s, ec:dmul
6.5 s at S=4096) so kernel work on ec/ can be iterated without a full
bench.py pass.  Run on the TPU tunnel host:

    python benches/ec_bench.py [S]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from tpu_mpc.ec import secp256k1 as ec  # noqa: E402


def timeit(label, fn, passes=3):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:14s} {best*1e3:9.2f} ms  {S/best:12.0f} op/s")
    return best


if __name__ == "__main__":
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(7)
    ks = ec.sc_from_ints(rng.integers(1, 1 << 63, S).astype(object) * rng.integers(1, 1 << 63, S).astype(object))
    k2 = ec.sc_from_ints(rng.integers(1, 1 << 63, S).astype(object) * 7919)
    P = ec.mul_generator(k2)
    Q = ec.mul_generator(ks)
    print(f"backend={jax.default_backend()} S={S}")
    timeit("mulG(comb)", lambda: ec.mul_generator(ks))
    timeit("smul(GLV)", lambda: ec.scalar_mul(ks, P))
    timeit("dmul", lambda: ec.dual_mul(ks, P, k2, Q))
    timeit("affine", lambda: ec.to_affine(P))
    timeit("xcoord", lambda: ec.x_coord_mod_q(P))
