#!/usr/bin/env python
"""Benchmark: batched GG20 2-of-3 threshold-ECDSA signing throughput.

Measures the full offline (6-round, MtA + range proofs + PDL) + online
(phase 7) signing pipeline over a batch of concurrent sessions sharing one
2048-bit key set (the production pattern: one signer group, many messages).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference (ZenGo-X/multi-party-ecdsa, Rust+GMP) publishes
no numbers and cannot run here (no Rust toolchain).  The baseline constant
below is an estimate for the reference on a 16-core server, derived from
its per-signature modexp count (~50 full-width modexps/signature across
2 signers at ~5 ms each with GMP -> ~4 sig/s/core, ~60 sig/s machine
assuming perfect scaling); see BASELINE.md.
"""

import json
import os
import sys
import time

BASELINE_SIG_PER_SEC_EST = 60.0  # reference est., 16-core host (see docstring)

# Persistent compilation cache: the r1 bench paid a 1014s compile warm-up on
# every driver run.  Caching compiled executables under the repo makes every
# subsequent run (same kernel set) skip straight to execution.  NOTE: the
# env-var spelling does not bind to jax.config in this jax build (verified:
# env set but config None) — set the config explicitly.
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    S = int(os.environ.get("BENCH_SESSIONS", "64"))
    bits = int(os.environ.get("BENCH_PAILLIER_BITS", "2048"))
    t0 = time.time()

    import numpy as np

    from tpu_mpc.protocols.gg20 import batch as gg20
    from tpu_mpc.utils.rng import SessionRng

    rng = SessionRng(0xBE7C)

    # one 2-of-3 key set, tiled across S sessions
    kg = gg20.keygen(1, 1, 3, rng, paillier_bits=bits)
    assert kg.ok.all(), "keygen failed"
    key1 = kg.key
    key = _tile_key(key1, S)
    sys.stderr.write(f"keygen+tile done in {time.time()-t0:.1f}s\n")

    m = 0x1C8AA4E93D8F4D7C9E21B5A7D301F2B8D4E6C0A9F3B5D7E9C1A3B5D7E9F10203

    # warm-up run (compiles all kernels)
    t1 = time.time()
    off = gg20.offline_stage(key, [0, 1], rng)
    sig = gg20.sign_online(off, m)
    assert sig.sig_valid.all(), "warm-up signatures invalid"
    sys.stderr.write(f"warm-up (compile) {time.time()-t1:.1f}s\n")

    from tpu_mpc.core import modctx as _modctx

    if _modctx.PROFILE:
        sys.stderr.write("== warm-up profile ==\n" + _modctx.profile_summary() + "\n")

    # timed run
    t2 = time.time()
    off = gg20.offline_stage(key, [0, 1], rng)
    sig = gg20.sign_online(off, m)
    dt = time.time() - t2
    assert sig.sig_valid.all(), "timed signatures invalid"

    if _modctx.PROFILE:
        sys.stderr.write("== timed-run profile ==\n" + _modctx.profile_summary() + "\n")

    sig_per_sec = S / dt
    print(
        json.dumps(
            {
                "metric": "gg20_2of3_sign_throughput",
                "value": round(sig_per_sec, 3),
                "unit": "signatures/sec/chip",
                "vs_baseline": round(sig_per_sec / BASELINE_SIG_PER_SEC_EST, 3),
            }
        )
    )


def _tile_key(key1, S):
    """Broadcast a 1-session key batch across S sessions."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_mpc.protocols.gg20.batch import LocalKeyBatch20
    from tpu_mpc.vss import feldman

    tile_np = lambda a: np.broadcast_to(a, (S,) + a.shape[1:]).copy()
    tile_tree = lambda tree: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (S,) + a.shape[1:]) if hasattr(a, "ndim") else a,
        tree,
    )
    return LocalKeyBatch20(
        S=S,
        t=key1.t,
        n=key1.n,
        paillier_bits=key1.paillier_bits,
        p=tile_np(key1.p),
        q=tile_np(key1.q),
        ek=key1.ek.tile(S),
        dk=tile_tree(key1.dk),
        dlog_stmt=key1.dlog_stmt.tile(S),
        u=tile_np(key1.u),
        x=tile_np(key1.x),
        y=tile_tree(key1.y),
        y_i=tile_tree(key1.y_i),
        vss=feldman.VssSchemeBatch(
            t=key1.vss.t, n=key1.vss.n, commitments=tile_tree(key1.vss.commitments)
        ),
    )


if __name__ == "__main__":
    main()
