"""Multi-chip sessions-axis sharding (SURVEY §2.3).

Runs on the 8-device virtual CPU mesh from conftest.  Validates that
(a) the core modexp kernel executes SPMD over the mesh and matches host
    ints, with output actually partitioned across devices;
(b) the EC scalar-mul kernel shards the same way;
(c) a full GG20 offline+online signing flow under the mesh produces
    bit-identical signatures to the single-device run (same seeded RNG),
    i.e. sharding is transparent to the protocol layer — the analog of the
    reference's aggregation points (gg_2020/party_i.rs:635-640,768-776,
    835-848) behaving identically under partitioning.
"""

import numpy as np
import pytest

import jax

from tpu_mpc import sharding
from tpu_mpc.core.modctx import ModCtx
from tpu_mpc.protocols.gg20 import batch as gg20
from tpu_mpc.utils.rng import SessionRng


def _mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sharding.sessions_mesh(8)


def test_modexp_sharded_matches_host():
    mesh = _mesh8()
    r = np.random.RandomState(3)
    bits = 256
    S = 16
    mods = np.asarray([(1 << 255) + 2 * int(r.randint(1 << 30)) + 1 for _ in range(S)], dtype=object)
    base = np.asarray([int(r.randint(1 << 30)) ** 3 + 7 for _ in range(S)], dtype=object)
    expo = np.asarray([int(r.randint(1 << 30)) + 3 for _ in range(S)], dtype=object)
    ctx = ModCtx.from_ints(mods, bits)
    with sharding.use_mesh(mesh):
        got = ctx.pow(base, expo)
    want = np.asarray([pow(int(b), int(e), int(m)) for b, e, m in zip(base, expo, mods)], dtype=object)
    assert (got == want).all()


def test_operands_actually_partitioned():
    mesh = _mesh8()
    import jax.numpy as jnp

    x = jnp.zeros((16, 4), dtype=jnp.uint32)
    with sharding.use_mesh(mesh):
        xs = sharding.shard_flat(x)
    assert len(xs.sharding.device_set) == 8
    # non-divisible batches stay single-device rather than failing
    y = jnp.zeros((6, 4), dtype=jnp.uint32)
    with sharding.use_mesh(mesh):
        ys = sharding.shard_flat(y)
    assert len(ys.sharding.device_set) == 1


def test_ec_mul_generator_sharded():
    mesh = _mesh8()
    from tpu_mpc.ec import secp256k1 as dec
    from tpu_mpc.core.limbs import batch_from_limbs
    from tpu_mpc.host import ec as hec

    ks = np.asarray([(i * 0x9E3779B97F4A7C15 + 1) % hec.N for i in range(1, 17)], dtype=object)
    with sharding.use_mesh(mesh):
        P = dec.mul_generator(dec.sc_from_ints(ks))
        xs, ys, _ = dec.to_affine(P)
    xs = batch_from_limbs(np.asarray(xs))
    ys = batch_from_limbs(np.asarray(ys))
    for i, k in enumerate(ks):
        hx, hy = hec.mul(int(k))
        assert (int(xs[i]), int(ys[i])) == (hx, hy)


@pytest.mark.slow
def test_gg20_sign_sharded_bit_identical():
    """Full offline+online under the mesh == single-device run, (r,s) equal."""
    mesh = _mesh8()
    S = 8
    rng = SessionRng(0x5A5A)
    kg = gg20.keygen(1, 1, 2, rng, paillier_bits=768)
    assert kg.ok.all()

    def tile(key1):
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from bench import _tile_key

        return _tile_key(key1, S)

    key = tile(kg.key)
    m = 0xA5C3_9F01_7B2D

    off_a = gg20.offline_stage(key, [0, 1], SessionRng(0x77))
    sig_a = gg20.sign_online(off_a, m)
    assert sig_a.sig_valid.all()

    with sharding.use_mesh(mesh):
        off_b = gg20.offline_stage(key, [0, 1], SessionRng(0x77))
        sig_b = gg20.sign_online(off_b, m)
    assert sig_b.sig_valid.all()
    assert (sig_a.r == sig_b.r).all() and (sig_a.s == sig_b.s).all()
