"""Device Paillier vs the host (python-int) oracle.

Uses small (512-bit) moduli so the CPU-emulated kernels stay fast; the
kernels are width-generic, and 2048-bit widths are covered by the core
montgomery tests + the TPU bench.
"""

import random

import numpy as np
import jax.numpy as jnp

from tpu_mpc.core.limbs import batch_from_limbs, batch_to_limbs, nlimbs
from tpu_mpc.host import paillier as hp
from tpu_mpc.paillier import paillier as dp

BITS = 512


def make_keys(k=2, seed=7):
    r = random.Random(seed)
    eks, dks = [], []
    for _ in range(k):
        ek, dk = hp.keypair(BITS, rng=r)
        eks.append(ek)
        dks.append(dk)
    bek = dp.BatchEncryptionKey.from_ints([e.n for e in eks], bits=BITS)
    bdk = dp.BatchDecryptionKey.from_ints([d.p for d in dks], [d.q for d in dks], bits=BITS)
    return eks, dks, bek, bdk


def test_encrypt_decrypt_roundtrip_vs_host():
    eks, dks, bek, bdk = make_keys()
    r = random.Random(11)
    L = nlimbs(BITS)
    ms = [r.randrange(ek.n) for ek in eks]
    rs = [hp.sample_randomness(ek, r) for ek in eks]
    m = jnp.asarray(batch_to_limbs(ms, L))
    rr = jnp.asarray(batch_to_limbs(rs, L))
    c = dp.encrypt(bek, m, rr)
    got = batch_from_limbs(np.asarray(c))
    # bit-exact vs host oracle under fixed randomness (the reference's
    # *_with_predefined_randomness seam, mta/mod.rs:62,111)
    want = [hp.encrypt(ek, mm, rv) for ek, mm, rv in zip(eks, ms, rs)]
    assert [int(v) for v in got] == want
    # device decrypt
    dec = dp.decrypt(bdk, c)
    got_m = [int(v) for v in batch_from_limbs(np.asarray(dec))]
    assert got_m == ms


def test_homomorphic_ops():
    eks, dks, bek, bdk = make_keys()
    r = random.Random(12)
    L = nlimbs(BITS)
    m1 = [r.randrange(1 << 128) for _ in eks]
    m2 = [r.randrange(1 << 128) for _ in eks]
    k = [r.randrange(1 << 128) for _ in eks]
    enc = lambda ms: dp.encrypt(
        bek,
        jnp.asarray(batch_to_limbs(ms, L)),
        jnp.asarray(batch_to_limbs([hp.sample_randomness(e, r) for e in eks], L)),
    )
    c1, c2 = enc(m1), enc(m2)
    s = dp.ciphertext_add(bek, c1, c2)
    got = [int(v) for v in batch_from_limbs(np.asarray(dp.decrypt(bdk, s)))]
    assert got == [a + b for a, b in zip(m1, m2)]

    kk = jnp.asarray(batch_to_limbs(k, nlimbs(128)))
    prod = dp.ciphertext_mul_plain(bek, c1, kk, ebits=128)
    got = [int(v) for v in batch_from_limbs(np.asarray(dp.decrypt(bdk, prod)))]
    assert got == [a * b % ek.n for a, b, ek in zip(m1, k, eks)]

    ap = dp.ciphertext_add_plain(bek, c1, jnp.asarray(batch_to_limbs(m2, L)))
    got = [int(v) for v in batch_from_limbs(np.asarray(dp.decrypt(bdk, ap)))]
    assert got == [a + b for a, b in zip(m1, m2)]


def test_decrypt_crt_mp_exceeds_q():
    """Regression: CRT recombination must reduce mp mod q before (mq - mp).

    When p > q the per-prime residue mp in [0, p) can exceed mq + q; a
    single conditional add of q then wraps wrong.  Force p > q and sweep
    messages until the mp > q case is hit.
    """
    r = random.Random(21)
    from tpu_mpc.host import primes

    while True:
        p = primes.gen_prime(BITS // 2, r)
        q = primes.gen_prime(BITS // 2, r)
        if p > q:
            break
    ek, dk = hp.EncryptionKey(p * q), hp.DecryptionKey(p, q)
    S = 32
    ms = [r.randrange(ek.n) for _ in range(S)]
    rs = [hp.sample_randomness(ek, r) for _ in range(S)]
    bek = dp.BatchEncryptionKey.from_ints([ek.n] * S, bits=BITS)
    bdk = dp.BatchDecryptionKey.from_ints([p] * S, [q] * S, bits=BITS)
    L = nlimbs(BITS)
    c = dp.encrypt(bek, jnp.asarray(batch_to_limbs(ms, L)), jnp.asarray(batch_to_limbs(rs, L)))
    got = [int(v) for v in batch_from_limbs(np.asarray(dp.decrypt(bdk, c)))]
    assert got == ms


def test_host_open_recovers_randomness():
    eks, dks, _, _ = make_keys(1)
    r = random.Random(13)
    m = r.randrange(eks[0].n)
    rnd = hp.sample_randomness(eks[0], r)
    c = hp.encrypt(eks[0], m, rnd)
    m2, r2 = hp.open(dks[0], c)
    assert (m2, r2) == (m, rnd)


def test_decrypt_sk_modctx_path_matches():
    """PaillierCtxBatch.decrypt_sk (ModCtx/RNS CRT decrypt, r4) must agree
    with the host decrypt and the CIOS limb decrypt on random ciphertexts,
    on both backends (TPU_MPC_RNS toggles via ModCtx dispatch)."""
    from tpu_mpc.zk.range_proofs import PaillierCtxBatch

    r = random.Random(77)
    keys = [hp.keypair(BITS, rng=r) for _ in range(3)]
    ek = PaillierCtxBatch.from_ints(
        [k[0].n for k in keys], bits=BITS
    ).attach_sk([k[1].p for k in keys], [k[1].q for k in keys])
    ms = [r.randrange(k[0].n) for k in keys]
    rs = [hp.sample_randomness(k[0], r) for k in keys]
    cs = np.asarray(
        [hp.encrypt(k[0], m, rr) for k, m, rr in zip(keys, ms, rs)], dtype=object
    )
    got = ek.decrypt_sk(cs)
    for g, m in zip(got.reshape(-1), ms):
        assert int(g) == m
    # lazy handle path
    lz = ek.decrypt_sk(cs, sync=False)
    assert [int(v) for v in lz.ints().reshape(-1)] == ms


def test_enc_randomizer_tables_path(monkeypatch):
    """Randomizer-base tables (THREAT_MODEL §7): r = g^t mod N must satisfy
    r^N == (g^N)^t mod N^2 exactly (the binomial identity), ciphertexts
    built from the table rn must decrypt, and the base derivation is
    deterministic with Jacobi(g|N) = -1."""
    from tpu_mpc.core.modctx import resolve
    from tpu_mpc.mta import mta
    from tpu_mpc.utils.rng import SessionRng
    from tpu_mpc.zk import range_proofs as rp

    monkeypatch.setattr(rp, "_ENC_TABLES_ENV", "1")
    r = random.Random(55)
    keys = [hp.keypair(BITS, rng=r) for _ in range(2)]
    ek = rp.PaillierCtxBatch.from_ints(
        [k[0].n for k in keys], BITS
    ).attach_sk([k[1].p for k in keys], [k[1].q for k in keys])
    ek.ensure_enc_tables()
    assert ek.enc_tab_g is not None
    for i, kk in enumerate(keys):
        g = int(ek.enc_g[i])
        assert g == rp._derive_enc_base(kk[0].n)  # deterministic
        assert rp._jacobi(g, kk[0].n) == -1
    srng = SessionRng(9)
    u, un_l = ek.sample_unit_with_power((2,), srng)
    un = resolve(un_l)
    for i, kk in enumerate(keys):
        n = kk[0].n
        assert int(un[i]) == pow(int(u[i]), n, n * n)
    ms = [r.randrange(keys[i][0].n) for i in range(2)]
    u2, un2_l = ek.sample_unit_with_power((2,), srng)
    c = mta.paillier_encrypt_ints(ek, np.asarray(ms, dtype=object), u2, rn=un2_l)
    for i, kk in enumerate(keys):
        assert hp.decrypt(kk[1], int(c[i])) == ms[i]
