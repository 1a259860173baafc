#!/usr/bin/env python
"""Microbenchmark: CIOS (VPU) vs RNS (MXU) modexp on the live device.

Times the hot class of GG20 signing — full-width modexp — across batch
sizes, reporting modexps/sec.  Usage:

    python benches/modexp_bench.py [--bits 2048] [--ebits 2048] \
        [--batches 64,256,1024] [--backends cios,rns_s8,rns_f32]
"""

import argparse
import os
import random
import sys
import time

# make `tpu_mpc` importable when invoked as `python benches/modexp_bench.py`
# (PYTHONPATH can't be used: it breaks the axon TPU plugin's registration)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax as _jax

_jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=2048)
    ap.add_argument("--ebits", type=int, default=2048)
    ap.add_argument("--batches", default="64,256,1024")
    ap.add_argument("--backends", default="cios,rns_s8,rns_f32")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tpu_mpc.core.rns as rns
    from tpu_mpc.core.limbs import batch_to_limbs, nlimbs
    from tpu_mpc.core.montgomery import MontCtx, mont_exp
    from tpu_mpc.core.rns import RnsCtx, rns_exp

    print(f"device: {jax.devices()}", file=sys.stderr)
    r = random.Random(99)
    bits, ebits = args.bits, args.ebits
    n_int = (r.getrandbits(bits) | (1 << (bits - 1))) | 1
    L, Le = nlimbs(bits), nlimbs(ebits)

    for B in [int(b) for b in args.batches.split(",")]:
        xs = np.asarray([r.getrandbits(bits) % n_int for _ in range(B)], dtype=object)
        es = np.asarray([r.getrandbits(ebits) for _ in range(B)], dtype=object)
        want = pow(int(xs[0]), int(es[0]), n_int)
        for backend in args.backends.split(","):
            try:
                if backend == "cios":
                    ctx = MontCtx.from_ints([n_int] * B, bits)
                    # one distinct exponent batch per rep: the tunnel/runtime
                    # may short-circuit byte-identical launches, which made
                    # repeated same-input timing read as ~0s
                    eds = [
                        jnp.asarray(batch_to_limbs(es ^ (k + 1), Le))
                        for k in range(args.reps)
                    ]
                    xd = jnp.asarray(batch_to_limbs(xs, L))
                    out = mont_exp(xd, jnp.asarray(batch_to_limbs(es, Le)), ctx,
                                   ebits=ebits)  # compile
                    np.asarray(out)  # block_until_ready is a no-op over the
                    t0 = time.perf_counter()  # axon tunnel: sync via transfer
                    for k in range(args.reps):
                        out = mont_exp(xd, eds[k], ctx, ebits=ebits)
                        np.asarray(out)
                    dt = (time.perf_counter() - t0) / args.reps
                    from tpu_mpc.core.limbs import batch_from_limbs

                    got = int(batch_from_limbs(np.asarray(out))[0])
                    ok = got == pow(int(xs[0]), int(es[0]) ^ args.reps, n_int)
                    print(
                        f"bits={bits} ebits={ebits} B={B:5d} {backend:8s} "
                        f"{dt:8.3f}s  {B/dt:10.1f} modexp/s  "
                        f"[{'ok' if ok else 'WRONG'}]"
                    )
                    continue
                else:
                    rns.DOT_IMPL = backend.split("_")[1]
                    ctx = RnsCtx.from_ints(np.asarray([n_int] * B, dtype=object), bits)
                    got_arr = rns_exp(ctx, [n_int] * B, xs, es, ebits)  # compile
                    t0 = time.perf_counter()
                    for k in range(args.reps):
                        out_k = rns_exp(ctx, [n_int] * B, xs, es ^ (k + 1), ebits)
                    dt = (time.perf_counter() - t0) / args.reps
                    # verify the TIMED path too (last perturbed exponent), not
                    # just the warm-up — symmetric with the CIOS branch
                    got = int(got_arr[0])
                    if int(out_k[0]) != pow(int(xs[0]), int(es[0]) ^ args.reps, n_int):
                        got = -1  # timed-path miscompute -> report WRONG
                ok = "ok" if got == want else "WRONG"
                print(
                    f"bits={bits} ebits={ebits} B={B:5d} {backend:8s} "
                    f"{dt:8.3f}s  {B/dt:10.1f} modexp/s  [{ok}]"
                )
            except Exception as e:  # report and keep going (backend may be unsupported)
                print(f"bits={bits} ebits={ebits} B={B:5d} {backend:8s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
