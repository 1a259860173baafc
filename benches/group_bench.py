#!/usr/bin/env python
"""Multi-tenant (distinct-key) GG20 serving bench: G signer groups x S/G
sessions each, one batched offline+online pass over the full S.

The headline bench (bench.py) serves ONE key set tiled across all S
sessions — the reference's serving pattern (one key per process,
/root/reference/examples/gg20_signing.rs:37-40).  A multi-tenant service
signs for MANY signer groups at once; this bench quantifies that regime:

  * fixed-base tables (ring-Pedersen h1/h2 + enc randomizer bases) stay
    compressed at G table groups and route per-session through the Pallas
    group-offset path (core/pallas_rns.py fixed_prod_dispatch gmap),
  * cross-session batch verification collapses per group — G products
    instead of one (zk/batch_verify.py grouped reductions).

Inputs: benches/bench_keys_S{>=G}_2048.json written by
  BENCH_MODE=keygen BENCH_SESSIONS=16 python bench.py
Output: benches/group_bench_result.json {g, S, sig_per_sec, passes};
bench.py folds it into the headline JSON as group_serving_g{G}_sig_per_sec.

Env: BENCH_GROUPS (default 8), BENCH_SESSIONS (default 4096),
BENCH_PASSES (default 2).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402


def _configure_jax():
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    if os.environ.get("BENCH_PLATFORM", "") != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _load_group_key(path, G, bits):
    """First G key sets from a saved keygen batch -> LocalKeyBatch20 (S=G)
    with fixed-base tables built at the G-group level."""
    import numpy as np

    from bench import _tuplify_pts
    from tpu_mpc.ec import secp256k1 as dec
    from tpu_mpc.paillier import paillier as dp
    from tpu_mpc.protocols.gg20.batch import LocalKeyBatch20
    from tpu_mpc.vss import feldman
    from tpu_mpc.zk.range_proofs import DlogStatementBatch, PaillierCtxBatch

    with open(path) as f:
        d = json.load(f)
    assert d.get("S", 1) >= G, f"need >= {G} cached key sets in {path}"
    A = lambda v: np.asarray(v, dtype=object)[:G]
    p, q = A(d["p"]), A(d["q"])
    ns = p * q
    y_i = dec.points_from_host(_tuplify_pts(d["y_i"][:G]))
    stmt = DlogStatementBatch.from_ints(A(d["nt"]), A(d["h1"]), A(d["h2"]), bits)
    ek = PaillierCtxBatch.from_ints(ns, bits).attach_sk(p, q)
    stmt.ensure_tables()
    ek.ensure_enc_tables()
    return LocalKeyBatch20(
        S=G, t=d["t"], n=d["n"], paillier_bits=bits,
        p=p, q=q, ek=ek,
        dk=dp.BatchDecryptionKey.from_ints(p, q, bits),
        dlog_stmt=stmt,
        u=A(d["u"]), x=A(d["x"]),
        y=dec.point_sum(y_i, axis=1), y_i=y_i,
        vss=feldman.VssSchemeBatch(
            t=d["t"], n=d["n"],
            commitments=dec.points_from_host(_tuplify_pts(d["vss"][:G])),
        ),
    )


def _repeat_key(keyG, S):
    """G-group key batch -> S sessions, interleaved (session s uses key
    group s % G); tables stay compressed behind the gmap."""
    import jax.numpy as jnp
    import numpy as np

    from tpu_mpc.protocols.gg20.batch import LocalKeyBatch20
    from tpu_mpc.vss import feldman

    G = keyG.S
    R = S // G
    rep_np = lambda a: np.tile(a, (R,) + (1,) * (a.ndim - 1))
    rep_tree = lambda tree: jax.tree_util.tree_map(
        lambda a: jnp.tile(a, (R,) + (1,) * (a.ndim - 1))
        if hasattr(a, "ndim") else a,
        tree,
    )
    return LocalKeyBatch20(
        S=S, t=keyG.t, n=keyG.n, paillier_bits=keyG.paillier_bits,
        p=rep_np(keyG.p), q=rep_np(keyG.q),
        ek=keyG.ek.repeat_interleaved(R),
        dk=rep_tree(keyG.dk),
        dlog_stmt=keyG.dlog_stmt.repeat_interleaved(R),
        u=rep_np(keyG.u), x=rep_np(keyG.x),
        y=rep_tree(keyG.y), y_i=rep_tree(keyG.y_i),
        vss=feldman.VssSchemeBatch(
            t=keyG.vss.t, n=keyG.vss.n,
            commitments=rep_tree(keyG.vss.commitments),
        ),
    )


def main():
    _configure_jax()
    G = int(os.environ.get("BENCH_GROUPS", "8"))
    S = int(os.environ.get("BENCH_SESSIONS", "4096"))
    bits = int(os.environ.get("BENCH_PAILLIER_BITS", "2048"))
    passes = int(os.environ.get("BENCH_PASSES", "2"))

    from tpu_mpc.protocols.gg20 import batch as gg20
    from tpu_mpc.utils.rng import SessionRng

    rng = SessionRng(0x6B05)
    src = None
    for cand in sorted(os.listdir(os.path.dirname(os.path.abspath(__file__)))):
        if cand.startswith("bench_keys_S") and cand.endswith(f"_{bits}.json"):
            src = os.path.join(os.path.dirname(os.path.abspath(__file__)), cand)
    assert src, "run BENCH_MODE=keygen BENCH_SESSIONS=16 python bench.py first"

    t0 = time.time()
    keyG = _load_group_key(src, G, bits)
    key = _repeat_key(keyG, S)
    sys.stderr.write(f"[t+{time.time()-t0:5.1f}s] {G}-group key built (S={S})\n")

    m = 0x1C8AA4E93D8F4D7C9E21B5A7D301F2B8D4E6C0A9F3B5D7E9C1A3B5D7E9F10203
    t1 = time.time()
    off = gg20.offline_stage(key, [0, 1], rng)
    sig = gg20.sign_online(off, m)
    assert sig.sig_valid.all(), "warm-up signatures invalid"
    sys.stderr.write(f"warm-up (compile) {time.time()-t1:.1f}s\n")

    dts = []
    for _ in range(passes):
        t2 = time.time()
        off = gg20.offline_stage(key, [0, 1], rng)
        sig = gg20.sign_online(off, m)
        dts.append(time.time() - t2)
        assert sig.sig_valid.all(), "timed signatures invalid"
    sys.stderr.write(f"timed passes: {[round(d, 1) for d in dts]}s\n")

    out = {
        "metric": "gg20_2of3_sign_throughput_multitenant",
        "g": G, "S": S,
        "sig_per_sec": round(S / min(dts), 3),
        "passes": [round(S / d, 2) for d in dts],
        "unit": "signatures/sec/chip",
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "group_bench_result.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
