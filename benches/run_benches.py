#!/usr/bin/env python
"""Per-protocol bench harnesses (reference: benches/ criterion suites).

Covers the reference's bench matrix (benches/multi_party_ecdsa/gg18/keygen.rs,
benches/two_party_ecdsa/lindell_2017/{keygen,sign}.rs, cclst_2019 equivalents)
plus GG20, batched the TPU way: one timed launch covers BENCH_SESSIONS
concurrent sessions, so per-session time = wall / S.

Prints one JSON line per bench:
  {"bench": "...", "wall_s": W, "sessions": S, "per_session_ms": ...}

Env: BENCH_SESSIONS (default 8), BENCH_PAILLIER_BITS (default 2048; use 768
for a quick CPU smoke run), BENCH_ONLY (comma-separated substring filter).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(name, fn, S, warm: bool = True):
    only = os.environ.get("BENCH_ONLY")
    if only and not any(tok in name for tok in only.split(",")):
        return
    if warm:
        fn()  # compile warm-up
    t0 = time.time()
    fn()
    dt = time.time() - t0
    print(json.dumps({
        "bench": name,
        "wall_s": round(dt, 4),
        "sessions": S,
        "per_session_ms": round(1000 * dt / S, 4),
    }))
    sys.stdout.flush()


def main():
    S = int(os.environ.get("BENCH_SESSIONS", "8"))
    bits = int(os.environ.get("BENCH_PAILLIER_BITS", "2048"))
    m = 0x31F7A65E315586AC198BD798B6629CE1B4C4E5AB37292BFA94B22C3B6A953E9B

    from tpu_mpc.protocols.cclst19 import batch as cclst
    from tpu_mpc.protocols.gg18 import batch as gg18
    from tpu_mpc.protocols.gg20 import batch as gg20
    from tpu_mpc.protocols.lindell17 import batch as l17
    from tpu_mpc.utils.rng import SessionRng

    rng = SessionRng(0xBE7C11)

    # gg18 keygen t=1,n=2 and t=2,n=3 (gg18/keygen.rs:9-21)
    _timed(f"gg18_keygen_t1_n2_{bits}b", lambda: gg18.keygen(S, 1, 2, rng, bits), S)
    kg23 = {}
    def _kg23():
        kg23["r"] = gg18.keygen(S, 2, 3, rng, bits)
    _timed(f"gg18_keygen_t2_n3_{bits}b", _kg23, S)
    _timed(f"gg18_sign_t2_n3_{bits}b",
           lambda: gg18.sign(kg23["r"].key, [0, 1, 2], m, rng), S)

    # gg20 keygen + offline + online (state_machine benchmarks analog)
    kg20 = {}
    def _kg20():
        kg20["r"] = gg20.keygen(S, 1, 3, rng, paillier_bits=bits)
    _timed(f"gg20_keygen_t1_n3_{bits}b", _kg20, S)
    off = {}
    def _off():
        off["r"] = gg20.offline_stage(kg20["r"].key, [0, 1], rng)
    _timed(f"gg20_offline_2of3_{bits}b", _off, S)
    _timed(f"gg20_online_{bits}b", lambda: gg20.sign_online(off["r"], m), S)

    # lindell17 2P keygen / sign (lindell_2017/{keygen,sign}.rs)
    l = {}
    def _lkg():
        l["r"] = l17.keygen(S, rng, paillier_bits=bits)
    _timed(f"lindell17_keygen_{bits}b", _lkg, S)
    _timed(f"lindell17_sign_{bits}b", lambda: l17.sign(l["r"], m, rng), S)

    # deployment path: per-party GG20 state machines over the in-process
    # simulator (examples/gg20_signing.rs:34-90 role).  Latency of ONE
    # session at per-party shapes — the interop/correctness path; batch
    # throughput is bench.py's headline.  Keygen (prime-bound) is excluded
    # from the timed region.
    def _sm_path():
        from tpu_mpc.runtime.gg20_keygen_sm import Gg20Keygen
        from tpu_mpc.runtime.gg20_sign_sm import (
            Gg20OfflineStage, partial_sig_local, sign_manual,
        )
        from tpu_mpc.runtime.state_machine import run_simulation

        outs = _sm_path.outs
        if outs is None:
            outs = _sm_path.outs = run_simulation(
                [Gg20Keygen(i, 1, 3, SessionRng(300 + i), paillier_bits=bits)
                 for i in (1, 2, 3)]
            )
        seed = _sm_path.seed = getattr(_sm_path, "seed", 400) + 10
        sms = [Gg20OfflineStage(1, [0, 1], outs[0], SessionRng(seed + 1)),
               Gg20OfflineStage(2, [0, 1], outs[1], SessionRng(seed + 2))]
        off = run_simulation(sms)
        p2 = partial_sig_local(off[1], m)
        sig = sign_manual(off[0], m, [p2])
        assert sig["valid"], "SM-path signature invalid"
    _sm_path.outs = None
    _timed(f"gg20_sm_path_sign_1session_{bits}b", _sm_path, 1)

    # cclst 2P keygen / sign (cclst_2019, host class groups -> small S)
    Sc = min(S, 2)
    c = {}
    def _ckg():
        c["r"] = cclst.keygen(Sc, rng)
    _timed(f"cclst19_keygen_{Sc}s", _ckg, Sc, warm=False)
    _timed(f"cclst19_sign_{Sc}s", lambda: cclst.sign(c["r"], m, rng), Sc, warm=False)


if __name__ == "__main__":
    main()
