"""Batched MtA / MtAwc (multiplicative-to-additive share conversion).

Re-implementation of /root/reference/src/utilities/mta/mod.rs batch-first:
Alice encrypts a under her Paillier key (+ range proofs against each peer's
ring-Pedersen setup); Bob homomorphically computes E(ab + beta') and proves
well-formedness; shares alpha + beta = ab mod q.

All ciphertext math runs as device modexps (ModCtx / Paillier limb kernels);
Paillier decryption uses the CRT device path.  EC proof parts use the
batched sigma-proof kernels.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..core.limbs import batch_from_limbs, batch_to_limbs, nlimbs
from ..core.modctx import ModCtx, _flatten_pad, _next_pow2
from ..ec import secp256k1 as dec
from ..host import ec as hec
from ..paillier import paillier as dp
from ..zk import sigma
from ..zk.range_proofs import (
    AliceProofBatch,
    BobProofBatch,
    DlogStatementBatch,
    PaillierCtxBatch,
    _mulmod,
    alice_prove,
    bob_prove,
    bob_verify,
)

Q = hec.N


def paillier_encrypt_ints(ek: PaillierCtxBatch, m, r, rn=None) -> np.ndarray:
    """(1 + m n) r^n mod n^2 on object ints (device modexp).

    rn: optionally the precomputed r^n (randomizer-table sampling,
    PaillierCtxBatch.sample_unit_with_power).  Key owners (attach_sk)
    otherwise take the CRT half-width path for r^n."""
    from ..core.modctx import resolve

    m = np.asarray(m, dtype=object)
    shape = np.broadcast_shapes(m.shape, np.shape(r), ek.n_ctx.batch_shape)
    n = np.broadcast_to(ek.n, shape)
    if rn is not None:
        rn = resolve(rn)
    elif ek.sk_ctx is not None:
        rn = ek.pow_n_sk(r)
    else:
        rn = ek.nn_ctx.pow(r, n, ek.n_ctx.bits)
    return _mulmod(np.broadcast_to(m, shape) * n + 1, rn, np.broadcast_to(ek.nn, shape))


def _canon_tree(tree, batch_shape):
    """Flatten+pad the leading batch dims of every array leaf of a pytree."""
    import jax

    return jax.tree_util.tree_map(
        lambda a: _flatten_pad(jnp.broadcast_to(a, batch_shape + a.shape[a.ndim - 1:]), batch_shape)
        if hasattr(a, "ndim")
        else a,
        tree,
    )


def expand_tree_axis(tree, axis: int):
    """Insert a batch axis into every array leaf of a pytree (so leading
    dims right-align for broadcasting, e.g. dk [S,t,L] -> [S,t,1,L] before
    decrypting a [S,t,t] ciphertext matrix)."""
    import jax

    return jax.tree_util.tree_map(
        lambda a: jnp.expand_dims(a, axis) if hasattr(a, "ndim") else a, tree
    )


def paillier_decrypt_ints(dk: dp.BatchDecryptionKey, c, batch_shape, bits: int = 2048) -> np.ndarray:
    """CRT decrypt object-int ciphertexts (device kernel, canonical shapes).

    dk leaves must have batch shape broadcastable to `batch_shape`.
    """
    c = np.broadcast_to(np.asarray(c, dtype=object), batch_shape)
    LL = nlimbs(2 * bits)
    c_l = jnp.asarray(batch_to_limbs(c, LL))
    cf = _flatten_pad(c_l, batch_shape)
    dkf = _canon_tree(dk, batch_shape)
    from ..core.modctx import prof_call

    out = prof_call("decrypt", cf.shape[0], bits, lambda: dp.decrypt(dkf, cf))
    lead = int(np.prod(batch_shape)) if batch_shape else 1
    res = batch_from_limbs(np.asarray(out[:lead]))
    return res.reshape(batch_shape) if batch_shape else res


@dataclasses.dataclass
class MessageABatch:
    """c = Enc_ek(a); optional range proofs, one per peer statement
    (mta/mod.rs:34-38)."""

    c: np.ndarray
    range_proofs: AliceProofBatch | None


def message_a(
    a_ints, ek: PaillierCtxBatch, randomness, stmts: DlogStatementBatch | None, rng
) -> MessageABatch:
    """Alice's message.  a: [...] ints < q; randomness: [...] < n.

    If stmts has a trailing peer axis (e.g. [S, n_peers]), a/randomness are
    broadcast against it and one proof per peer is produced.
    """
    c = paillier_encrypt_ints(ek, a_ints, randomness)
    proofs = None
    if stmts is not None:
        proofs = alice_prove(a_ints, c, ek, stmts, randomness, rng)
    return MessageABatch(c=c, range_proofs=proofs)


@dataclasses.dataclass
class MessageBBatch:
    """Bob's response (mta/mod.rs:40-45) + optional BobProofs per peer."""

    c: np.ndarray                       # E(ab + beta')
    b_proof: sigma.DLogProof            # PoK of b with pk = bG
    beta_tag_proof: sigma.DLogProof     # PoK of beta' mod q
    range_proofs: BobProofBatch | None = None


def message_b(
    b_ints,
    ek: PaillierCtxBatch,
    msg_a_c,
    alice_proofs: AliceProofBatch | None,
    own_stmt: DlogStatementBatch | None,
    rng,
    prove_stmt: DlogStatementBatch | None = None,
    wc: bool = False,
):
    """-> (MessageBBatch, beta [...] ints, randomness, beta_tag) or raises
    per-slot validity via the returned alice_ok mask.

    own_stmt: Bob's own (h1,h2,N_tilde) used to VERIFY Alice's proof.
    prove_stmt: statement under which Bob generates his own range proof
    (GG20 uses Alice's... in the reference Bob proves under the same
    dlog_statement vector he verified with).
    """
    b_arr = np.asarray(b_ints, dtype=object)
    shape = np.broadcast_shapes(b_arr.shape, ek.n_ctx.batch_shape, np.shape(msg_a_c))
    n = np.broadcast_to(ek.n, shape)

    alice_ok = None
    if alice_proofs is not None and own_stmt is not None:
        # cross-session batched check when the sessions axis shares one key
        # set (production pattern); transparent per-session fallback inside
        from ..zk.batch_verify import alice_verify_fast

        alice_ok = alice_verify_fast(alice_proofs, msg_a_c, ek, own_stmt)

    # force object dtype: for scalar shapes rng returns bare python ints and
    # np.mod on a raw bigint overflows C long
    beta_tag = np.asarray(rng.below(n, shape), dtype=object)
    # Enc(beta') and c_a^b are independent launches: dispatch both async,
    # run the EC dlog proofs while they fly, decode last.  Bob encrypts
    # under ALICE's key: the randomizer tables (when built) replace the
    # only remaining full-width r^N here.
    from ..core.modctx import resolve

    nn = np.broadcast_to(ek.nn, shape)
    if ek.enc_tab_g is not None:
        # without a Bob range proof the r VALUE is only ever revealed on
        # blame: defer its launch entirely (DeferredLaunch)
        randomness, rn_l = ek.sample_unit_with_power(
            shape, rng, sync=False, defer_value=prove_stmt is None
        )
        if prove_stmt is not None:
            randomness = np.asarray(randomness, dtype=object)
    else:
        randomness = np.asarray(rng.below(n, shape), dtype=object)
        rn_l = ek.nn_ctx.pow(randomness, n, ek.n_ctx.bits, sync=False)
    b_ca_l = ek.nn_ctx.pow(msg_a_c, b_arr, 256, sync=False)
    # vectorize keeps object dtype even for 0-d shapes (np.mod on a 0-d
    # object array collapses to a raw bigint and overflows C long)
    beta = np.vectorize(lambda v: (-int(v)) % Q, otypes=[object])(beta_tag)

    b_proof = sigma.dlog_prove(dec.sc_from_ints(np.mod(np.broadcast_to(b_arr, shape), Q)), rng)
    beta_tag_proof = sigma.dlog_prove(dec.sc_from_ints(np.mod(beta_tag, Q)), rng)

    c_beta_tag = _mulmod(
        np.broadcast_to(beta_tag, shape) * n + 1, resolve(rn_l), nn
    )
    c_b = _mulmod(resolve(b_ca_l), c_beta_tag, nn)

    range_proofs = None
    if prove_stmt is not None:
        X_pts = None
        if wc:
            xl, yl, _ = dec.to_affine(b_proof.pk)
            X_pts = (batch_from_limbs(np.asarray(xl)), batch_from_limbs(np.asarray(yl)))
        range_proofs = bob_prove(
            np.mod(np.broadcast_to(b_arr, shape), Q),
            beta_tag,
            msg_a_c,
            c_b,
            randomness,
            ek,
            prove_stmt,
            rng,
            check=wc,
            X_pts=X_pts,
            r_is_table=ek.enc_tab_g is not None,
        )

    msg = MessageBBatch(c=c_b, b_proof=b_proof, beta_tag_proof=beta_tag_proof, range_proofs=range_proofs)
    return msg, beta, randomness, beta_tag, alice_ok


def msg_b_index(m: MessageBBatch, i: int) -> MessageBBatch:
    """Slice a stacked-[2, ...] MessageBBatch (the gamma/w pair of the GG20
    responder step) back into one path's view."""
    sl = lambda p: sigma.DLogProof(
        pk=dec.point_index_axis(p.pk, i, 0),
        commitment=dec.point_index_axis(p.commitment, i, 0),
        z=p.z[i],
    )
    return MessageBBatch(
        c=m.c[i], b_proof=sl(m.b_proof), beta_tag_proof=sl(m.beta_tag_proof)
    )


def verify_proofs_get_alpha(
    dk: dp.BatchDecryptionKey, msg_b: MessageBBatch, a_ints, batch_shape,
    ek_sk: PaillierCtxBatch | None = None,
):
    """Alice decrypts alpha and checks Bob's dlog proofs + the EC identity
    b*a*G + beta'G == alpha G  (mta/mod.rs:160-179).

    ek_sk: alice's PaillierCtxBatch with attach_sk — when given (and the
    RNS backend is active) decryption takes the ModCtx decrypt_sk path
    (RNS/MXU kernels, measured faster than the CIOS limb decrypt).

    -> (alpha mod q ints, alpha_raw ints, ok mask)
    """
    from ..core.modctx import rns_enabled

    if ek_sk is not None and ek_sk.sk_p is not None and rns_enabled():
        alpha_raw = np.broadcast_to(
            np.asarray(ek_sk.decrypt_sk(msg_b.c), dtype=object), batch_shape
        )
    else:
        alpha_raw = paillier_decrypt_ints(dk, msg_b.c, batch_shape)
    alpha = np.mod(alpha_raw, Q)
    ok = sigma.dlog_verify(msg_b.b_proof) & sigma.dlog_verify(msg_b.beta_tag_proof)
    g_alpha = dec.mul_generator(dec.sc_from_ints(alpha))
    a_sc = dec.sc_from_ints(np.mod(np.broadcast_to(np.asarray(a_ints, dtype=object), batch_shape), Q))
    ba_btag = dec.point_add(dec.scalar_mul(a_sc, msg_b.b_proof.pk), msg_b.beta_tag_proof.pk)
    ok = ok & np.asarray(dec.point_eq(ba_btag, g_alpha))
    return alpha, alpha_raw, ok
