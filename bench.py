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
BENCH_SEED = 0xBE7C  # public, pinned: the key cache is bench-only, NOT secret
_KEYGEN_WALL_S = None  # measured at cache-build time; reported from the cache

# Persistent compilation cache: the r1 bench paid a 1014s compile warm-up on
# every driver run.  Caching compiled executables under the repo makes every
# subsequent run (same kernel set) skip straight to execution.  NOTE: the
# env-var spelling does not bind to jax.config in this jax build (verified:
# env set but config None) — set the config explicitly.
import jax  # noqa: E402


def _configure_jax():
    """Platform + persistent-cache config.  Called from main(), NOT at import
    time: tests exec this module for _save_key/_load_key, and a module-level
    jax.config.update would enable the persistent cache for the whole CPU
    pytest process (pathologically slow compiles — see tests/conftest.py)."""
    # BENCH_PLATFORM=cpu: debug/profile runs off-TPU.  The env-var spelling
    # (JAX_PLATFORMS) does not bind in this build and the axon plugin ignores
    # it, so go through jax.config like tests/conftest.py does.
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    if os.environ.get("BENCH_PLATFORM", "") != "cpu":
        # persistent cache only on the TPU path: on CPU this build's cache
        # makes compiles pathologically slow (see tests/conftest.py).
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    _configure_jax()
    if os.environ.get("BENCH_MODE") == "keygen":
        return keygen_bench()
    # default S=4096: the r4 throughput peak — the r3 regression past 2048
    # (launch/decode-bound) vanished with the device-reduced verification
    # and stacked MtA paths (r4 sweep: 46 @2048, 57 @4096 sig/s/chip)
    S = int(os.environ.get("BENCH_SESSIONS", "4096"))
    bits = int(os.environ.get("BENCH_PAILLIER_BITS", "2048"))

    # multi-chip / multi-host: TPU_MPC_DISTRIBUTED=1 spans hosts via
    # jax.distributed; BENCH_MESH=1 activates the sessions mesh over all
    # visible devices (sessions-DP, collective-free)
    from tpu_mpc.sharding import mesh as shmesh

    shmesh.maybe_init_distributed()
    if int(os.environ.get("BENCH_MESH", "0")):
        shmesh.activate(shmesh.sessions_mesh())
    t0 = time.time()

    import numpy as np

    from tpu_mpc.protocols.gg20 import batch as gg20
    from tpu_mpc.utils.rng import SessionRng

    rng = SessionRng(BENCH_SEED)

    # one 2-of-3 key set, tiled across S sessions.  Keygen is deterministic
    # under the pinned SessionRng seed, so the generated key is cached as
    # ints on disk: the driver's bench run skips ~3 min of safe-prime
    # generation + keygen-kernel compiles and starts at the signing pipeline.
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f"benches/bench_key_{bits}.json")
    sys.stderr.write(f"[t+{time.time()-t0:6.1f}s] imports done\n")
    key1 = _load_key(cache)
    sys.stderr.write(f"[t+{time.time()-t0:6.1f}s] key cache loaded\n")
    if key1 is None:
        global _KEYGEN_WALL_S
        tkg = time.time()
        kg = gg20.keygen(1, 1, 3, rng, paillier_bits=bits)
        kg_dt = time.time() - tkg
        assert kg.ok.all(), "keygen failed"
        key1 = kg.key
        # measured distributed-keygen rate rides along in the cache so every
        # later (cache-hit) bench run still reports a MEASURED number
        _KEYGEN_WALL_S = kg_dt
        _save_key(cache, key1, keygen_wall_s=kg_dt)
        sys.stderr.write(f"keygen (3-party, {bits}b) measured: {kg_dt:.1f}s/session\n")
    # (cache hit: signing just draws from the fresh stream — any valid
    # randomness is equivalent for throughput measurement)
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

    # timed runs: tunnel/device throughput jitters ±10% run-to-run, so take
    # the best of BENCH_PASSES (default 2) full passes — each is an honest
    # complete offline+online pass with all signatures verified
    passes = int(os.environ.get("BENCH_PASSES", "2"))
    dts = []
    for _ in range(passes):
        t2 = time.time()
        off = gg20.offline_stage(key, [0, 1], rng)
        sig = gg20.sign_online(off, m)
        dts.append(time.time() - t2)
        assert sig.sig_valid.all(), "timed signatures invalid"

    if _modctx.PROFILE:
        sys.stderr.write("== timed-run profile ==\n" + _modctx.profile_summary() + "\n")

    # reference-exact-mode companion (VERDICT r4 #3): one timed pass with
    # the two documented protocol deviations disabled — per-proof
    # verification (range_proofs.rs:105-156) and uniform encryption
    # randomizers (mta/mod.rs:68-75).  Reported alongside the headline so
    # the apples-to-apples cost of the deviations is always quantified.
    # BENCH_REF_EXACT=0 skips it (e.g. quick local iterations).
    ref_exact = None
    if int(os.environ.get("BENCH_REF_EXACT", "1")) and \
            "TPU_MPC_BATCH_VERIFY" not in os.environ:
        os.environ["TPU_MPC_BATCH_VERIFY"] = "0"
        os.environ["TPU_MPC_ENC_TABLES"] = "0"
        try:
            t3 = time.time()  # warm-up (compiles the full-width kernels)
            off = gg20.offline_stage(key, [0, 1], rng)
            sig = gg20.sign_online(off, m)
            assert sig.sig_valid.all(), "ref-exact warm-up signatures invalid"
            sys.stderr.write(f"ref-exact warm-up {time.time()-t3:.1f}s\n")
            t3 = time.time()
            off = gg20.offline_stage(key, [0, 1], rng)
            sig = gg20.sign_online(off, m)
            ref_dt = time.time() - t3
            assert sig.sig_valid.all(), "ref-exact signatures invalid"
            ref_exact = S / ref_dt
            sys.stderr.write(f"ref-exact pass {ref_dt:.1f}s = {ref_exact:.1f} sig/s\n")
        finally:
            del os.environ["TPU_MPC_BATCH_VERIFY"]
            del os.environ["TPU_MPC_ENC_TABLES"]

    dt = min(dts)
    sys.stderr.write(f"timed passes: {[round(d, 1) for d in dts]}s\n")
    sig_per_sec = S / dt
    out = {
        "metric": "gg20_2of3_sign_throughput",
        "value": round(sig_per_sec, 3),
        "unit": "signatures/sec/chip",
        "vs_baseline": round(sig_per_sec / BASELINE_SIG_PER_SEC_EST, 3),
        "timed_passes": [round(S / d, 2) for d in dts],
    }
    if ref_exact is not None:
        out["reference_exact_mode_sig_per_sec"] = round(ref_exact, 3)
    # measured baselines, when present:
    #  * cpu_baseline_result.json — the GMP (reference-substrate) GG20 flow
    #    measured on THIS host (benches/cpu_baseline.py); vs_baseline then
    #    compares a measurement to a measurement (the 60 sig/s 16-core
    #    estimate stays visible as vs_baseline_est_16core)
    #  * keygen s/session — measured when the bench key cache was built
    cpu_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benches/cpu_baseline_result.json")
    if os.path.exists(cpu_path):
        with open(cpu_path) as f:
            cpu = json.load(f)
        meas = cpu.get("sig_per_sec")
        if meas:
            out["cpu_baseline_sig_per_sec_measured"] = meas
            out["vs_baseline_est_16core"] = out["vs_baseline"]
            out["vs_baseline"] = round(sig_per_sec / meas, 3)
    if _KEYGEN_WALL_S:
        out["keygen_3party_sessions_per_sec"] = round(1.0 / _KEYGEN_WALL_S, 5)
    # measured side artifacts from in-round runs, when present:
    #  * batched keygen (BENCH_MODE=keygen BENCH_SESSIONS=16) amortization
    #  * multi-tenant serving (benches/group_bench.py, G=8 key groups)
    bdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "benches")
    kg16 = os.path.join(bdir, "bench_keys_S16_2048.json")
    if os.path.exists(kg16):
        with open(kg16) as f:
            d = json.load(f)
        if d.get("keygen_wall_s"):
            out["keygen_batched_s16_sessions_per_sec"] = round(
                d.get("S", 16) / d["keygen_wall_s"], 5)
    grp = os.path.join(bdir, "group_bench_result.json")
    if os.path.exists(grp):
        with open(grp) as f:
            d = json.load(f)
        if d.get("sig_per_sec"):
            out[f"group_serving_g{d.get('g', 8)}_sig_per_sec"] = d["sig_per_sec"]
    print(json.dumps(out))


def keygen_bench():
    """BENCH_MODE=keygen: full GG20 2048-bit distributed keygen throughput
    (rounds 1-4 incl. safe-prime-free Paillier keypairs, ring-Pedersen
    setup, correct-key + composite-dlog proofs, VSS — the per-round timing
    story of gg_2020/state_machine/keygen.rs:499-510).  Host prime
    generation dominates; the C++ helper parallelizes across cores."""
    import sys as _sys

    from tpu_mpc.protocols.gg20 import batch as gg20
    from tpu_mpc.utils.rng import SessionRng

    S = int(os.environ.get("BENCH_SESSIONS", "4"))
    bits = int(os.environ.get("BENCH_PAILLIER_BITS", "2048"))
    rng = SessionRng(0xFACE)
    t0 = time.time()
    res = gg20.keygen(S, 1, 3, rng, paillier_bits=bits)
    dt = time.time() - t0
    assert res.ok.all(), "keygen failed"
    _sys.stderr.write(f"keygen S={S} n=3 {bits}b: {dt:.1f}s\n")
    # persist the whole batch: distinct key sets feed the multi-tenant
    # (G>1) serving bench, and the measured rate rides into the headline
    # bench output (keygen_batched_sessions_per_sec)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"benches/bench_keys_S{S}_{bits}.json",
    )
    _save_key(out_path, res.key, keygen_wall_s=dt, seed=0xFACE)
    print(
        json.dumps(
            {
                "metric": "gg20_3party_keygen_throughput",
                "value": round(S / dt, 4),
                "unit": "sessions/sec/chip",
                "vs_baseline": None,
                "sessions": S,
            }
        )
    )


def _save_key(path, key1, keygen_wall_s=None, seed=None):
    """Persist a LocalKeyBatch20 (any S) as plain ints (cache note in main)."""
    import json

    import numpy as np

    from tpu_mpc.ec import secp256k1 as dec

    E = lambda a: np.vectorize(int, otypes=[object])(
        np.asarray(a, dtype=object)
    ).tolist()
    obj = {
        "WARNING": "bench-only key, derived from the public seed below — NOT secret",
        "seed": BENCH_SEED if seed is None else seed,
        "keygen_wall_s": keygen_wall_s,
        "S": key1.S,
        "t": key1.t, "n": key1.n, "bits": key1.paillier_bits,
        "p": E(key1.p), "q": E(key1.q),
        "nt": E(key1.dlog_stmt.ctx.n_ints),
        "h1": E(key1.dlog_stmt.h1), "h2": E(key1.dlog_stmt.h2),
        "u": E(key1.u), "x": E(key1.x),
        "y_i": dec.points_to_host_list(key1.y_i),
        "vss": dec.points_to_host_list(key1.vss.commitments),
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


def _tuplify_pts(v):
    """JSON lists -> the (x, y)-tuple / None leaves points_from_host expects."""
    if v is None:
        return None
    if isinstance(v, list) and len(v) == 2 and isinstance(v[0], int):
        return (v[0], v[1])
    return [_tuplify_pts(e) for e in v]


def _load_key(path):
    if not os.path.exists(path):
        return None
    import json

    import numpy as np

    from tpu_mpc.ec import secp256k1 as dec
    from tpu_mpc.paillier import paillier as dp
    from tpu_mpc.protocols.gg20.batch import LocalKeyBatch20
    from tpu_mpc.vss import feldman
    from tpu_mpc.zk.range_proofs import DlogStatementBatch, PaillierCtxBatch

    with open(path) as f:
        d = json.load(f)
    if d.get("seed") != BENCH_SEED:
        return None  # provenance mismatch: regenerate under the pinned seed
    global _KEYGEN_WALL_S
    _KEYGEN_WALL_S = d.get("keygen_wall_s")
    import sys
    import time

    t0 = time.time()
    A = lambda v: np.asarray(v, dtype=object)
    p, q, bits = A(d["p"]), A(d["q"]), d["bits"]
    ns = p * q
    y_i = dec.points_from_host(_tuplify_pts(d["y_i"]))
    stmt = DlogStatementBatch.from_ints(A(d["nt"]), A(d["h1"]), A(d["h2"]), bits)
    ek = PaillierCtxBatch.from_ints(ns, bits).attach_sk(p, q)
    sys.stderr.write(f"  [load: ctxs built +{time.time()-t0:.1f}s]\n")
    _load_or_build_tables(path, stmt, ek)
    sys.stderr.write(f"  [load: tables ready +{time.time()-t0:.1f}s]\n")
    return LocalKeyBatch20(
        S=1, t=d["t"], n=d["n"], paillier_bits=bits,
        p=p, q=q,
        ek=ek,
        dk=dp.BatchDecryptionKey.from_ints(p, q, bits),
        dlog_stmt=stmt,
        u=A(d["u"]), x=A(d["x"]),
        y=dec.point_sum(y_i, axis=1), y_i=y_i,
        vss=feldman.VssSchemeBatch(
            t=d["t"], n=d["n"],
            commitments=dec.points_from_host(_tuplify_pts(d["vss"])),
        ),
    )


def _load_or_build_tables(key_path, stmt, ek):
    """Fixed-base tables (h1/h2 ring-Pedersen + enc randomizer bases) are
    deterministic given the cached key, but cost ~60-100 s to build on a
    tunneled chip (serial-montmul latency-bound).  Persist the built device
    arrays next to the key cache so warm bench runs load them in ~2 s."""
    import numpy as np

    from tpu_mpc.core.modctx import rns_enabled

    from tpu_mpc.zk.range_proofs import PaillierCtxBatch as _PCB

    tab_path = key_path.replace(".json", "_tables.npz")
    want_rns = rns_enabled()
    want_eb = _PCB.enc_table_max_ebits(ek.n_ctx.bits)
    if os.path.exists(tab_path):
        import jax.numpy as jnp

        z = np.load(tab_path)
        if bool(z["rns"]) == want_rns and z["seed"] == BENCH_SEED and \
                "enc_eb" in z and int(z["enc_eb"]) == want_eb:
            J = lambda k: jnp.asarray(z[k])
            if want_rns:
                stmt.tables_rns = tuple(
                    tuple(J(f"h{b}_{c}") for c in range(3)) for b in range(2)
                )
                if "encg_0" in z:
                    ek.enc_g = np.asarray([int(v) for v in z["enc_g_ints"]],
                                          dtype=object).reshape(z["enc_g_shape"])
                    ek.enc_tab_g = tuple(J(f"encg_{c}") for c in range(3))
                    ek.enc_tab_h = tuple(J(f"ench_{c}") for c in range(3))
                    ek.enc_tab_rns = True
                else:
                    ek.ensure_enc_tables()  # cache predates the enc tables
            else:
                stmt.tables = (J("h0"), J("h1"))
                # enc tables are not persisted in CIOS form: rebuild so a
                # warm run measures the same code path as a cold one
                ek.ensure_enc_tables()
            return
    stmt.ensure_tables()
    ek.ensure_enc_tables()
    out = {"rns": want_rns, "seed": BENCH_SEED, "enc_eb": want_eb}
    if want_rns and stmt.tables_rns is not None:
        for b in range(2):
            for c in range(3):
                out[f"h{b}_{c}"] = np.asarray(stmt.tables_rns[b][c])
        if ek.enc_tab_g is not None:
            for c in range(3):
                out[f"encg_{c}"] = np.asarray(ek.enc_tab_g[c])
                out[f"ench_{c}"] = np.asarray(ek.enc_tab_h[c])
            out["enc_g_ints"] = np.asarray(
                [str(int(v)) for v in np.asarray(ek.enc_g, dtype=object).reshape(-1)]
            )
            out["enc_g_shape"] = np.asarray(ek.enc_g).shape
    elif stmt.tables is not None:
        out["h0"] = np.asarray(stmt.tables[0])
        out["h1"] = np.asarray(stmt.tables[1])
    np.savez(tab_path, **out)


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
