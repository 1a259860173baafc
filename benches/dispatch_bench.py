"""Dispatch-overhead microbench for the Pallas modexp substrate.

The r5 roofline showed the fused RNS kernel at ~28% of the VPU ceiling
kernel-only, but launch-attributed profile rates of only 4-14% VPU — the
gap is dispatch: host packing (object ints -> limbs -> e-words), the
device transfer (a tunnel in this environment), and the host decode of
the result planes.  This bench splits ONE fixed-base-product launch and
one variable-base modexp launch into stages and times each, so the
dominant stage is measured rather than guessed.

    python benches/dispatch_bench.py [S] [bits]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def stage(label, fn, n=3):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "block_until_ready")]
        for x in leaves:
            x.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:28s} {best*1e3:9.2f} ms")
    return out, best


if __name__ == "__main__":
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    import random

    from tpu_mpc.core import pallas_rns as pr
    from tpu_mpc.core import rns
    from tpu_mpc.core.limbs import batch_to_limbs, nlimbs
    from tpu_mpc.core.modctx import ModCtx

    r = random.Random(3)
    # one shared odd modulus (the single-key serving pattern)
    n = (r.getrandbits(bits) | (1 << (bits - 1)) | 1)
    par = rns.RnsParams(bits)
    ctx = ModCtx.from_ints(np.asarray([n] * S, dtype=object), nbits=bits)
    rctx = ctx.rns_ctx()
    base = np.asarray([r.randrange(1, n) for _ in range(S)], dtype=object)
    expv = np.asarray([r.getrandbits(bits) for _ in range(S)], dtype=object)
    ebits = bits

    print(f"backend={jax.default_backend()} S={S} bits={bits} "
          f"K={par.K} Kp={par.Kp}")

    # --- full dispatched modexp (what the protocol pays) ------------------
    def full():
        lz = pr.exp_dispatch(rctx, np.asarray([n] * S, dtype=object),
                             base, expv, ebits)
        return lz.ints()

    _, t_full = stage("exp full (pack+kernel+decode)", full)

    # --- stage splits -----------------------------------------------------
    n_b = np.broadcast_to(np.asarray([n] * S, dtype=object), (S,))
    t0 = time.perf_counter()
    xw_np = pr._pack_words(
        batch_to_limbs(np.mod(base, n_b), par.Lin).reshape(S, par.Lin))
    e_l = batch_to_limbs(expv, nlimbs(ebits)).reshape(S, nlimbs(ebits))
    ew_np = pr._pack_words(e_l)
    t_pack = time.perf_counter() - t0
    print(f"  {'host pack (limbs+e-words)':28s} {t_pack*1e3:9.2f} ms")

    xw = jnp.asarray(xw_np)
    Bp = pr._pad_cols(S)
    eP = jnp.asarray(np.ascontiguousarray(
        np.pad(ew_np, ((0, Bp - S), (0, 0))).T))

    def upload():
        return (jnp.asarray(xw_np), jnp.asarray(
            np.ascontiguousarray(np.pad(ew_np, ((0, Bp - S), (0, 0))).T)))

    stage("upload (x+e words)", upload)

    A, Bres, rr = pr._unpack_residues(xw, par.Lin, *par.dev_consts())
    A = A.reshape(S, par.K)
    Bres = Bres.reshape(S, par.Kp)
    rr = rr.reshape(S)
    shared, blocks, ctx_arrs = pr._ctx_blocks(rctx, (S,), Bp, n_b=n_b)
    cP, N64, monP, monQ, r2P, r2Q = blocks
    xP, xQ = pr._prep_x(A, Bres, rr, bits, Bp)
    ne2 = eP.shape[0]

    def kernel_only():
        return pr._exp_call(xP, xQ, eP, cP, N64, monP, monQ, r2P, r2Q,
                            nbits=bits, ne2=ne2, interp=False,
                            emit_planes=True, shared=shared)

    (oX, oY), t_k = stage("kernel (device-resident)", kernel_only)

    def decode_transfer():
        lo, hi = pr._planes_out(oX, oY, bits, S)
        return np.asarray(lo), np.asarray(hi)

    (lo_np, hi_np), t_dec = stage("plane download", decode_transfer)

    t0 = time.perf_counter()
    lz = rns.RnsLazy(parts=(jnp.asarray(lo_np), jnp.asarray(hi_np)),
                     shape=(S,), n_b=n_b, MA=par.MA)
    vals = lz.ints()
    t_host = time.perf_counter() - t0
    print(f"  {'host decode (ints)':28s} {t_host*1e3:9.2f} ms")
    ok = vals[0] == pow(int(base[0]), int(expv[0]), n)
    print(f"  correct={ok}  modexp/s full={S/t_full:.0f} "
          f"kernel-only={S/t_k:.0f}")
