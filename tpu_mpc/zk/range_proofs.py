"""Batched MtA range proofs (GG19 Appendix A; ING-derived).

Re-implementation of /root/reference/src/utilities/mta/range_proofs.rs
(AliceProof :103-193, BobProof :320-487, BobProofExt :491-535) with the
hybrid split: all modexps batched on device (ModCtx.pow), multiplies /
inverses / SHA-256 on host ints.

Proof shapes and checks mirror the reference exactly:

  AliceProof(z, e, s, s1, s2) proves Enc plaintext a < q^3:
    z = h1^a h2^rho mod ~N; u = (alpha N + 1) beta^N mod N^2;
    w = h1^alpha h2^gamma mod ~N; e = H(N, N+1, c, z, u, w);
    s = r^e beta mod N; s1 = e a + alpha; s2 = e rho + gamma.
    Verify recomputes u, w from the responses and the e-inverses
    (range_proofs.rs:105-156), checks s1 <= q^3 and the hash.

  BobProof(t, z, e, s, s1, s2, t1, t2) (+ u point for the "wc" variant)
    proves the MessageB response is well-formed (range_proofs.rs:214-298);
    the wc variant appends X=bG, u=alpha G to the hash and checks
    s1 G == e X + u (range_proofs.rs:522-529).

Sampling domains follow range_proofs.rs:48-51, 231-237 (incl. the comment
deviations: gamma in [0, q^2 N), tau in [0, q^3 ~N)).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..core.modctx import ModCtx
from ..hashes.fiat_shamir import digest_rows
from ..host import ec as hec

Q = hec.N
Q3 = Q**3


def _table_group_rows(gmap, bdims, batch_shape, shape):
    """Flattened table-group row per call element, for group-compressed
    fixed-base tables (G groups serving S sessions).

    gmap: [S] session -> group index.  bdims: the table batch dims
    (G,) + rest, where rest right-aligns with batch_shape[1:] (party
    slots etc.).  shape: the call batch shape, possibly with extra leading
    stacked axes.  Row-major flattened row = g * prod(rest) + sub(rest)."""
    S = int(batch_shape[0])
    extra = len(shape) - len(batch_shape)
    gm = np.asarray(gmap, dtype=np.int64).reshape(
        (1,) * extra + (S,) + (1,) * (len(batch_shape) - 1)
    )
    rest = tuple(int(d) for d in bdims[1:])
    pr = int(np.prod(rest, dtype=np.int64)) if rest else 1
    rows = gm * pr
    if pr > 1:
        sub = np.arange(pr, dtype=np.int64).reshape(
            (1,) * (len(shape) - len(rest)) + rest
        )
        rows = rows + sub
    return np.broadcast_to(rows, shape)


@dataclasses.dataclass
class DlogStatementBatch:
    """(N_tilde, h1, h2) batch — the ring-Pedersen setup of each party.

    `tables` optionally holds fixed-base window tables (T1, T2) for h1/h2
    ([nw, 16, ...batch, L] device arrays, see ModCtx.make_tables): h1/h2 are
    fixed for the life of a key, so every ring-Pedersen commitment in the
    MtA range proofs / PDLwSlack (range_proofs.rs:58-67,145-156) can run
    with ZERO squarings.  Build once on the root statement (ensure_tables)
    before any expand/take — derived views inherit the tables."""

    ctx: ModCtx               # N_tilde moduli
    h1: np.ndarray
    h2: np.ndarray
    tables: tuple | None = None   # (T1, T2), batch dims at positions 2..-2
    tables_rns: tuple | None = None  # ((tA,tB,tr) x2) RNS-form tables
    # multi-tenant serving (G distinct key groups tiled across S sessions):
    # tables stay compressed at G session-rows; gmap [S] maps session ->
    # group (s % G for the interleaved layout) and n_groups records G for
    # the grouped cross-session batch verification (zk/batch_verify.py)
    gmap: np.ndarray | None = None
    n_groups: int = 1

    @classmethod
    def from_ints(cls, n_tildes, h1s, h2s, bits: int = 2048):
        return cls(
            ctx=ModCtx.from_ints(n_tildes, bits),
            h1=np.asarray(h1s, dtype=object),
            h2=np.asarray(h2s, dtype=object),
        )

    _TABLE_MAX_BASES = 64  # tables cost ~18 MB per base at 2048-bit
    # widest per-session ring-Pedersen exponent is < Q^3 * N_tilde * 2^16;
    # the cross-session batched RHS (zk/batch_verify.py) sums gamma_s-weighted
    # responses, adding GAMMA_BITS + log2(S) <= 160 bits on top
    _BATCH_SUM_SLACK = 160

    def ensure_tables(self) -> "DlogStatementBatch":
        """Build the h1/h2 fixed-base tables (idempotent, one device launch).
        max_ebits covers the widest ring-Pedersen exponent: gamma/tau/s2/t2
        < Q^3 * N_tilde plus response slack, plus the batch-verify sum slack.

        Only worthwhile (and only affordable) when the statement batch is a
        small set of long-lived setups — the production pattern: one signer
        group's [1, n] statements serving thousands of sessions.  For large
        all-distinct batches this is a no-op and callers fall back to the
        shared-squaring pow_prod path."""
        from ..core.modctx import rns_enabled

        if rns_enabled():
            # accelerator path: RNS tables (MXU montmuls, ~1.4x the CIOS
            # fixed-base rate at 2048-bit — r3 measured matrix)
            if self.tables_rns is None:
                nstat = int(np.prod(self.ctx.batch_shape)) if self.ctx.batch_shape else 1
                if nstat > self._TABLE_MAX_BASES:
                    return self
                stacked = np.stack(
                    [np.broadcast_to(self.h1, self.ctx.batch_shape),
                     np.broadcast_to(self.h2, self.ctx.batch_shape)]
                )
                self.tables_rns = tuple(
                    self.ctx.make_tables_rns(stacked, max_ebits=768 + self.ctx.bits + 16 + self._BATCH_SUM_SLACK)
                )
            return self
        if self.tables is None:
            nstat = int(np.prod(self.ctx.batch_shape)) if self.ctx.batch_shape else 1
            if nstat > self._TABLE_MAX_BASES:
                return self
            stacked = np.stack(
                [np.broadcast_to(self.h1, self.ctx.batch_shape),
                 np.broadcast_to(self.h2, self.ctx.batch_shape)]
            )
            tab = self.ctx.make_tables(stacked, max_ebits=768 + self.ctx.bits + 16 + self._BATCH_SUM_SLACK)
            self.tables = (tab[:, :, 0], tab[:, :, 1])
        return self

    def pow_h1h2(self, e1, e2, hints, sync: bool = True) -> np.ndarray:
        """h1^e1 * h2^e2 mod N_tilde — fixed-base path when tables exist.
        hints (required) are exponent bit-widths from the sampling domain /
        clamped field width, never measured from values (ADVICE r1).
        sync=False: async dispatch, returns a lazy handle (core.modctx)."""
        if self.tables_rns is not None:
            gmap = None
            if self.gmap is not None:
                from ..core.pallas_rns import pallas_enabled

                if not pallas_enabled():
                    # compressed-group tables need the Pallas row-offset
                    # path; fall back to the plain product off-accelerator
                    return self.ctx.pow_prod(
                        [self.h1, self.h2], [e1, e2], ebits_hints=hints,
                        sync=sync,
                    )
                shape = np.broadcast_shapes(
                    np.shape(e1), np.shape(e2), self.ctx.batch_shape
                )
                gmap = _table_group_rows(
                    self.gmap, self.tables_rns[0][0].shape[2:-1],
                    self.ctx.batch_shape, shape,
                )
            return self.ctx.pow_fixed_prod_rns(
                self.tables_rns, [e1, e2], hints, sync=sync, gmap=gmap
            )
        if self.tables is not None and self.gmap is None:
            return self.ctx.pow_fixed_prod(self.tables, [e1, e2], hints, sync=sync)
        return self.ctx.pow_prod([self.h1, self.h2], [e1, e2], ebits_hints=hints, sync=sync)

    def take(self, indices, axis: int) -> "DlogStatementBatch":
        import jax.numpy as jnp

        # group-compressed tables index G groups (not S sessions) on their
        # sessions axis: a sessions-axis take slices gmap, never the tables
        take_tabs = axis > 0 or self.gmap is None
        tk = lambda T: jnp.take(T, jnp.asarray(indices), axis=2 + axis) \
            if take_tabs else T
        return DlogStatementBatch(
            ctx=self.ctx.take(indices, axis),
            h1=np.take(self.h1, indices, axis=axis),
            h2=np.take(self.h2, indices, axis=axis),
            tables=None if self.tables is None else tuple(tk(T) for T in self.tables),
            tables_rns=None if self.tables_rns is None else tuple(
                tuple(tk(c) for c in T) for T in self.tables_rns
            ),
            gmap=np.take(self.gmap, indices, axis=0) if axis == 0 and
            self.gmap is not None else self.gmap,
            n_groups=self.n_groups,
        )

    def expand(self, axis: int) -> "DlogStatementBatch":
        import jax.numpy as jnp

        ex = lambda T: jnp.expand_dims(T, 2 + axis)
        return DlogStatementBatch(
            ctx=self.ctx.expand(axis),
            h1=np.expand_dims(self.h1, axis),
            h2=np.expand_dims(self.h2, axis),
            tables=None if self.tables is None else tuple(ex(T) for T in self.tables),
            tables_rns=None if self.tables_rns is None else tuple(
                tuple(ex(c) for c in T) for T in self.tables_rns
            ),
            gmap=self.gmap,
            n_groups=self.n_groups,
        )

    def swapped(self) -> "DlogStatementBatch":
        """(N, g=h2, ni=h1) — the base_h2 statement of gg20 keygen."""
        return DlogStatementBatch(
            ctx=self.ctx, h1=self.h2, h2=self.h1,
            tables=None if self.tables is None else (self.tables[1], self.tables[0]),
            tables_rns=None if self.tables_rns is None
            else (self.tables_rns[1], self.tables_rns[0]),
            gmap=self.gmap,
            n_groups=self.n_groups,
        )

    def repeat_interleaved(self, R: int) -> "DlogStatementBatch":
        """G-group batch -> S = G*R sessions, interleaved (session s uses
        group s % G).  Tables stay compressed at G rows; per-session calls
        route through gmap (multi-tenant serving, Pallas path)."""
        G = int(self.ctx.batch_shape[0])
        rep = lambda a: np.tile(a, (R,) + (1,) * (a.ndim - 1))
        return DlogStatementBatch(
            ctx=self.ctx.repeat_lead(R),
            h1=rep(self.h1),
            h2=rep(self.h2),
            tables=self.tables,
            tables_rns=self.tables_rns,
            gmap=np.tile(np.arange(G, dtype=np.int64), R),
            n_groups=G,
        )

    def tile(self, S: int) -> "DlogStatementBatch":
        # tables keep their size-1 sessions axis: materializing S copies of
        # a ~35 MB table would blow HBM; they broadcast in-kernel instead.
        tile_np = lambda a: np.broadcast_to(a, (S,) + a.shape[1:]).copy()
        return DlogStatementBatch(
            ctx=self.ctx.tile(S),
            h1=tile_np(self.h1),
            h2=tile_np(self.h2),
            tables=self.tables,
            tables_rns=self.tables_rns,
        )


_ENC_TABLES_AUTO: bool | None = None


def enc_tables_enabled() -> bool:
    """Randomizer-base tables knob: '1' force on, '0' off, unset = auto
    (on for accelerators, like the RNS backend — THREAT_MODEL.md §7).
    The env var is read per call (not at import): it is a security-relevant
    opt-out and must work regardless of import order."""
    global _ENC_TABLES_AUTO
    env = __import__("os").environ.get("TPU_MPC_ENC_TABLES")
    if env is not None:
        return env == "1"
    if _ENC_TABLES_AUTO is None:
        import jax

        _ENC_TABLES_AUTO = jax.default_backend() != "cpu"
    return _ENC_TABLES_AUTO


def _jacobi(a: int, n: int) -> int:
    """Jacobi symbol (n odd > 0) — host helper for the enc-base derivation."""
    a %= n
    result = 1
    while a:
        while a % 2 == 0:
            a //= 2
            if n % 8 in (3, 5):
                result = -result
        a, n = n, a
        if a % 4 == 3 and n % 4 == 3:
            result = -result
        a %= n
    return result if n == 1 else 0


def _derive_enc_base(n) -> int:
    """Deterministic public randomizer base for modulus n: hash-counter
    stream mod n, first unit with Jacobi(g|n) = -1 (so g^t covers both
    Jacobi classes — see the enc-tables note on PaillierCtxBatch)."""
    import hashlib
    import math

    n = int(n)
    nbytes = (n.bit_length() + 7) // 8 + 16
    ctr = 0
    while True:
        buf = b""
        i = 0
        while len(buf) < nbytes:
            buf += hashlib.sha256(
                b"tpu-mpc enc-base|" + n.to_bytes((n.bit_length() + 7) // 8, "big")
                + b"|" + ctr.to_bytes(4, "big") + b"|" + i.to_bytes(4, "big")
            ).digest()
            i += 1
        g = int.from_bytes(buf[:nbytes], "big") % n
        if g > 1 and math.gcd(g, n) == 1 and _jacobi(g, n) == -1:
            return g
        ctr += 1


@dataclasses.dataclass
class PaillierCtxBatch:
    """Alice's Paillier public key batch with device ctxs for N and N^2.

    When the holder IS the key owner, attach_sk installs a stacked
    half-width context over (p^2, q^2): x^N mod N^2 then runs as two
    2048-bit modexps in one launch + a host CRT recombination (pow_n_sk)
    — measured ~2.9x modexp/s at half width, so ~1.4x end-to-end on every
    prover-side self-encryption (c_a, alice_prove beta^N, PDLwSlack u2).
    Public-verifier paths never see the sk fields."""

    n_ctx: ModCtx
    nn_ctx: ModCtx
    sk_ctx: ModCtx | None = None     # [2, ...batch] ctx over (p^2, q^2)
    sk_e: np.ndarray | None = None   # [2, ...batch] N mod p(p-1) / q(q-1)
    sk_pp: np.ndarray | None = None  # [...batch] p^2
    sk_cr: np.ndarray | None = None  # [...batch] (p^2)^{-1} mod q^2
    sk_p: np.ndarray | None = None   # [...batch] p (decrypt_sk CRT pieces)
    sk_q: np.ndarray | None = None
    sk_hp: np.ndarray | None = None  # L_p((1+n)^{p-1} mod p^2)^{-1} mod p
    sk_hq: np.ndarray | None = None
    sk_pinv_q: np.ndarray | None = None  # p^{-1} mod q

    @classmethod
    def from_ints(cls, ns, bits: int = 2048):
        ns = np.asarray(ns, dtype=object)
        return cls(
            n_ctx=ModCtx.from_ints(ns, bits),
            nn_ctx=ModCtx.from_ints(ns * ns, 2 * bits),
        )

    def attach_sk(self, ps, qs) -> "PaillierCtxBatch":
        """Install the owner's CRT fast path (ps*qs must equal n)."""
        p = np.asarray(ps, dtype=object)
        q = np.asarray(qs, dtype=object)
        pp, qq = p * p, q * q
        self.sk_ctx = ModCtx.from_ints(np.stack([pp, qq]), self.n_ctx.bits)
        n = self.n
        self.sk_e = np.stack([
            np.vectorize(lambda nv, pv: int(nv) % (int(pv) * (int(pv) - 1)),
                         otypes=[object])(n, p),
            np.vectorize(lambda nv, qv: int(nv) % (int(qv) * (int(qv) - 1)),
                         otypes=[object])(n, q),
        ])
        self.sk_pp = pp
        self.sk_cr = np.vectorize(lambda a, b: pow(int(a), -1, int(b)),
                                  otypes=[object])(pp, qq)
        self.sk_p, self.sk_q = p, q

        def hx(nv, xv):
            u = pow(1 + int(nv), int(xv) - 1, int(xv) * int(xv))
            return pow((u - 1) // int(xv), -1, int(xv))

        self.sk_hp = np.vectorize(hx, otypes=[object])(n, p)
        self.sk_hq = np.vectorize(hx, otypes=[object])(n, q)
        self.sk_pinv_q = np.vectorize(lambda a, b: pow(int(a), -1, int(b)),
                                      otypes=[object])(p, q)
        return self

    # ---- randomizer-base tables (r4) ------------------------------------
    # Sampling Paillier randomness as r = g^t mod N with r^N = h^t mod N^2
    # (h = g^N, t < N * 2^64) turns EVERY r^N — the 2048-bit-exponent
    # modexps dominating the prover side AND Bob's Enc(beta') under Alice's
    # key — into zero-squaring fixed-base table products.  (a + kN)^N =
    # a^N mod N^2, so (g^t mod N)^N == (g^N)^t mod N^2 exactly: wire format,
    # proofs (s = r^e beta) and the blame replays are unchanged.  g is
    # derived deterministically from N (hash counter, Jacobi -1 so both
    # Jacobi classes occur); r is then uniform in <g> instead of Z_N^* —
    # an indistinguishability assumption documented in THREAT_MODEL.md §7.
    # TPU_MPC_ENC_TABLES=0 disables (uniform r, the reference's sampling).
    enc_g: np.ndarray | None = None        # [...batch] the derived base g
    enc_tab_g: object = None               # fixed-base tables of g mod N
    enc_tab_h: object = None               # fixed-base tables of h mod N^2
    enc_tab_rns: bool = False
    # multi-tenant serving: tables compressed at G session-rows, gmap [S]
    # session -> group, n_groups = G (see DlogStatementBatch)
    gmap: np.ndarray | None = None
    n_groups: int = 1

    _ENC_EBITS = 64                        # t < N * 2^_ENC_EBITS

    @classmethod
    def enc_table_max_ebits(cls, bits: int) -> int:
        # widest table exponent: t*e + t' < 2^(bits + _ENC_EBITS + E_BITS + 8)
        # (the folded proof response s = g^(t_r e + t_beta), see alice_prove)
        return bits + cls._ENC_EBITS + E_BITS + 8

    def ensure_enc_tables(self) -> "PaillierCtxBatch":
        """Build the (g, h) randomizer tables (idempotent; call on the
        small pre-tile key batch, like DlogStatementBatch.ensure_tables)."""
        from ..core.modctx import resolve, rns_enabled

        if not enc_tables_enabled() or self.enc_tab_g is not None:
            return self
        nstat = int(np.prod(self.n_ctx.batch_shape)) if self.n_ctx.batch_shape else 1
        if nstat > 64:
            return self
        g = np.vectorize(_derive_enc_base, otypes=[object])(self.n)
        h = resolve(
            self.pow_n_sk(g) if self.sk_ctx is not None
            else self.nn_ctx.pow(g, self.n, ebits_hint=self.n_ctx.bits)
        )
        max_eb = self.enc_table_max_ebits(self.n_ctx.bits)
        self.enc_g = g
        if rns_enabled():
            self.enc_tab_g = self.n_ctx.make_tables_rns(g[None], max_ebits=max_eb)[0]
            self.enc_tab_h = self.nn_ctx.make_tables_rns(h[None], max_ebits=max_eb)[0]
            self.enc_tab_rns = True
        else:
            self.enc_tab_g = self.n_ctx.make_tables(g[None], max_ebits=max_eb)[:, :, 0]
            self.enc_tab_h = self.nn_ctx.make_tables(h[None], max_ebits=max_eb)[:, :, 0]
            self.enc_tab_rns = False
        return self

    def sample_unit_with_power(self, shape, rng, sync: bool = False,
                               defer_value: bool = False, want_t: bool = False):
        """-> (u, u^N mod N^2 lazy[, t]): a unit with its N-th power.

        Table path when built+enabled (u = g^t); otherwise uniform unit
        with the owner-CRT or full-width pow — semantics of every caller
        (encryption randomness, proof maskers) are identical either way.

        defer_value=True (table path): the u VALUE's launch is not even
        dispatched — callers that only reveal u on blame get a
        DeferredLaunch handle (resolve() materializes on demand).
        want_t=True: also return the table exponent t (None off-table) so
        provers can fold g^t powers (e.g. s = g^(t_r e + t_beta))."""
        from ..core.modctx import DeferredLaunch, resolve as _res

        n_b = np.broadcast_to(self.n, shape)
        usable_tabs = self.enc_tab_g is not None
        if usable_tabs and self.gmap is not None:
            from ..core.pallas_rns import pallas_enabled

            # compressed-group tables need the Pallas row-offset path;
            # off-accelerator the sampling falls through to uniform units
            usable_tabs = pallas_enabled() and self.enc_tab_rns
        if usable_tabs:
            import jax.numpy as jnp

            t = rng.below(n_b << self._ENC_EBITS, shape)
            eb = (self.n_ctx.bits + self._ENC_EBITS,)
            gmap = None
            if self.gmap is not None:
                gmap = _table_group_rows(
                    self.gmap, self.enc_tab_g[0].shape[2:-1],
                    self.n_ctx.batch_shape, shape,
                )
            # extra leading batch dims (e.g. a stacked gamma/w path axis)
            # need matching broadcast axes in the table batch (at 2..)
            extra = max(0, len(shape) - len(self.n_ctx.batch_shape))

            def grow(c):
                for _ in range(extra):
                    c = jnp.expand_dims(c, 2)
                return c

            ex = lambda T: tuple(grow(c) for c in T) if isinstance(T, tuple) else grow(T)
            tab_g, tab_h = ex(self.enc_tab_g), ex(self.enc_tab_h)
            if self.enc_tab_rns:
                u_fn = lambda: self.n_ctx.pow_fixed_prod_rns(
                    (tab_g,), [t], eb, sync=False, gmap=gmap
                )
                un_l = self.nn_ctx.pow_fixed_prod_rns(
                    (tab_h,), [t], eb, sync=sync, gmap=gmap
                )
            else:
                u_fn = lambda: self.n_ctx.pow_fixed_prod(
                    (tab_g,), [t], eb, sync=False
                )
                un_l = self.nn_ctx.pow_fixed_prod((tab_h,), [t], eb, sync=sync)
            u = DeferredLaunch(u_fn) if defer_value else _res(u_fn())
            return (u, un_l, t) if want_t else (u, un_l)
        u = rng.units_below(n_b, shape)
        if self.sk_ctx is not None:
            un_l = self.pow_n_sk(u, sync=sync)
        else:
            un_l = self.nn_ctx.pow(u, n_b, ebits_hint=self.n_ctx.bits, sync=sync)
        return (u, un_l, None) if want_t else (u, un_l)

    def pow_enc_base(self, exps, ebits_hint: int, sync: bool = False):
        """g^e mod N from the randomizer table (e < enc_table_max_ebits) —
        the fold for proof responses s = r^e beta = g^(t_r e + t_beta)."""
        import jax.numpy as jnp

        exps = np.asarray(exps, dtype=object)
        shape = np.broadcast_shapes(exps.shape, self.n_ctx.batch_shape)
        extra = max(0, len(shape) - len(self.n_ctx.batch_shape))

        def grow(c):
            for _ in range(extra):
                c = jnp.expand_dims(c, 2)
            return c

        T = self.enc_tab_g
        gmap = None
        if self.gmap is not None:
            gmap = _table_group_rows(
                self.gmap, T[0].shape[2:-1], self.n_ctx.batch_shape, shape
            )
        T = tuple(grow(c) for c in T) if isinstance(T, tuple) else grow(T)
        if self.enc_tab_rns:
            return self.n_ctx.pow_fixed_prod_rns(
                (T,), [exps], (ebits_hint,), sync=sync, gmap=gmap
            )
        return self.n_ctx.pow_fixed_prod((T,), [exps], (ebits_hint,), sync=sync)

    def decrypt_sk(self, c_ints, sync: bool = True):
        """CRT Paillier decrypt on the ModCtx path: the two half-width
        c^{x-1} mod x^2 modexps run as ONE stacked device launch (RNS/MXU
        kernels on accelerators — measured faster than the CIOS limb
        decrypt), with the L-function exact divisions / h multipliers / CRT
        recombination deferred to a lazy host map.  Same math as
        paillier.decrypt (kzen decrypt_crt shape, rounds.rs:264-280)."""
        from ..core.modctx import LazyMap, resolve

        c = np.asarray(c_ints, dtype=object)
        shape = np.broadcast_shapes(c.shape, self.n_ctx.batch_shape)
        exps = np.stack([
            np.broadcast_to(self.sk_p, shape) - 1,
            np.broadcast_to(self.sk_q, shape) - 1,
        ])
        # extra leading batch dims of c (e.g. the stacked gamma/w path axis)
        # must NOT right-align against the sk ctx's own (p^2, q^2) axis:
        # insert broadcast axes after it so pq stays the leading axis
        sk_ctx = self.sk_ctx
        for _ in range(max(0, len(shape) - len(self.n_ctx.batch_shape))):
            sk_ctx = sk_ctx.expand(1)
        u_l = sk_ctx.pow(c[None], exps, ebits_hint=self.n_ctx.bits // 2,
                         sync=False)
        pb = np.broadcast_to(self.sk_p, shape).reshape(-1)
        qb = np.broadcast_to(self.sk_q, shape).reshape(-1)
        hpb = np.broadcast_to(self.sk_hp, shape).reshape(-1)
        hqb = np.broadcast_to(self.sk_hq, shape).reshape(-1)
        crb = np.broadcast_to(self.sk_pinv_q, shape).reshape(-1)

        def combine(u):
            up = np.broadcast_to(u[0], shape).reshape(-1)
            uq = np.broadcast_to(u[1], shape).reshape(-1)
            out = np.empty(up.shape[0], dtype=object)
            for i in range(up.shape[0]):
                p_, q_ = int(pb[i]), int(qb[i])
                mp = (int(up[i]) - 1) // p_ * int(hpb[i]) % p_
                mq = (int(uq[i]) - 1) // q_ * int(hqb[i]) % q_
                out[i] = mp + p_ * ((mq - mp) * int(crb[i]) % q_)
            return out.reshape(shape)

        lz = LazyMap(u_l, combine)
        return resolve(lz) if sync else lz

    def pow_n_sk(self, base, sync: bool = True):
        """base^N mod N^2 via the attached sk (see class docstring)."""
        from ..core.modctx import LazyMap, resolve

        base = np.asarray(base, dtype=object)
        shape = np.broadcast_shapes(base.shape, self.n_ctx.batch_shape)
        halves_l = self.sk_ctx.pow(
            base[None], self.sk_e, ebits_hint=self.n_ctx.bits, sync=False
        )
        pp = np.broadcast_to(self.sk_pp, shape)
        cr = np.broadcast_to(self.sk_cr, shape)
        qq_arr = np.broadcast_to(self.sk_ctx.n_ints[1], shape)

        def combine(halves):
            rp = np.broadcast_to(halves[0], shape).reshape(-1)
            rq = np.broadcast_to(halves[1], shape).reshape(-1)
            fpp = pp.reshape(-1)
            fcr = cr.reshape(-1)
            fqq = qq_arr.reshape(-1)
            out = np.empty(rp.shape[0], dtype=object)
            for i in range(rp.shape[0]):
                d = (int(rq[i]) - int(rp[i])) * int(fcr[i]) % int(fqq[i])
                out[i] = int(rp[i]) + int(fpp[i]) * d
            return out.reshape(shape)

        lz = LazyMap(halves_l, combine)
        return resolve(lz) if sync else lz

    @property
    def n(self):
        return self.n_ctx.n_ints

    @property
    def nn(self):
        return self.nn_ctx.n_ints

    def _map(self, fn_mod, fn_np, fn_tab=None) -> "PaillierCtxBatch":
        np0 = lambda a: None if a is None else fn_np(a, lead=0)
        # enc tables: [nw, 16, ...batch, L] (or the RNS (tA, tB, tr) triple)
        # with batch dims at 2..-2, like DlogStatementBatch.tables
        tab = lambda T: (
            None if T is None or fn_tab is None
            else (tuple(fn_tab(c) for c in T) if isinstance(T, tuple) else fn_tab(T))
        )
        return PaillierCtxBatch(
            n_ctx=fn_mod(self.n_ctx),
            nn_ctx=fn_mod(self.nn_ctx),
            sk_ctx=None if self.sk_ctx is None else fn_mod(self.sk_ctx, lead=1),
            sk_e=None if self.sk_e is None else fn_np(self.sk_e, lead=1),
            sk_pp=np0(self.sk_pp),
            sk_cr=np0(self.sk_cr),
            sk_p=np0(self.sk_p),
            sk_q=np0(self.sk_q),
            sk_hp=np0(self.sk_hp),
            sk_hq=np0(self.sk_hq),
            sk_pinv_q=np0(self.sk_pinv_q),
            enc_g=np0(self.enc_g),
            enc_tab_g=tab(self.enc_tab_g),
            enc_tab_h=tab(self.enc_tab_h),
            enc_tab_rns=self.enc_tab_rns,
            gmap=self.gmap,
            n_groups=self.n_groups,
        )

    def take(self, indices, axis: int) -> "PaillierCtxBatch":
        import jax.numpy as jnp

        # group-compressed enc tables index G groups on their sessions
        # axis: a sessions-axis take slices gmap instead of the tables
        take_tabs = axis > 0 or self.gmap is None
        out = self._map(
            lambda c, lead=0: c.take(indices, axis + lead),
            lambda a, lead=0: np.take(a, indices, axis=axis + lead),
            fn_tab=(lambda T: jnp.take(T, jnp.asarray(indices), axis=2 + axis))
            if take_tabs else (lambda T: T),
        )
        if axis == 0 and self.gmap is not None:
            out.gmap = np.take(self.gmap, indices, axis=0)
        return out

    def expand(self, axis: int) -> "PaillierCtxBatch":
        import jax.numpy as jnp

        return self._map(
            lambda c, lead=0: c.expand(axis + lead),
            lambda a, lead=0: np.expand_dims(a, axis + lead),
            fn_tab=lambda T: jnp.expand_dims(T, 2 + axis),
        )

    def tile(self, S: int) -> "PaillierCtxBatch":
        # sk leaves keep their [2, 1, ...] batch and broadcast in-kernel
        return PaillierCtxBatch(
            n_ctx=self.n_ctx.tile(S),
            nn_ctx=self.nn_ctx.tile(S),
            sk_ctx=self.sk_ctx,
            sk_e=self.sk_e,
            sk_pp=self.sk_pp,
            sk_cr=self.sk_cr,
            sk_p=self.sk_p,
            sk_q=self.sk_q,
            sk_hp=self.sk_hp,
            sk_hq=self.sk_hq,
            sk_pinv_q=self.sk_pinv_q,
            # enc tables keep their size-1 sessions axis (broadcast in-kernel)
            enc_g=self.enc_g,
            enc_tab_g=self.enc_tab_g,
            enc_tab_h=self.enc_tab_h,
            enc_tab_rns=self.enc_tab_rns,
            gmap=self.gmap,
            n_groups=self.n_groups,
        )

    def repeat_interleaved(self, R: int) -> "PaillierCtxBatch":
        """G-group batch -> S = G*R sessions, interleaved (session s uses
        group s % G); enc tables stay compressed at G rows behind gmap."""
        G = int(self.n_ctx.batch_shape[0])
        rep = lambda a, lead=0: None if a is None else np.tile(
            a, (1,) * lead + (R,) + (1,) * (a.ndim - lead - 1)
        )
        return PaillierCtxBatch(
            n_ctx=self.n_ctx.repeat_lead(R),
            nn_ctx=self.nn_ctx.repeat_lead(R),
            sk_ctx=None if self.sk_ctx is None else self.sk_ctx.repeat_lead(R, axis=1),
            sk_e=rep(self.sk_e, lead=1),
            sk_pp=rep(self.sk_pp),
            sk_cr=rep(self.sk_cr),
            sk_p=rep(self.sk_p),
            sk_q=rep(self.sk_q),
            sk_hp=rep(self.sk_hp),
            sk_hq=rep(self.sk_hq),
            sk_pinv_q=rep(self.sk_pinv_q),
            enc_g=rep(self.enc_g),
            enc_tab_g=self.enc_tab_g,
            enc_tab_h=self.enc_tab_h,
            enc_tab_rns=self.enc_tab_rns,
            gmap=np.tile(np.arange(G, dtype=np.int64), R),
            n_groups=G,
        )


from ..core.modctx import host_mulmod as _mulmod  # noqa: E402 (re-export)


def pts_from_xy(xs, ys):
    """Affine coordinate object-arrays -> device Point batch of same shape."""
    from ..ec import secp256k1 as dec

    xs = np.asarray(xs, dtype=object)
    ys = np.asarray(ys, dtype=object)
    shape = np.broadcast_shapes(xs.shape, ys.shape)
    fx = np.broadcast_to(xs, shape).reshape(-1)
    fy = np.broadcast_to(ys, shape).reshape(-1)
    P = dec.points_from_host([(int(a), int(b)) for a, b in zip(fx, fy)])
    rs = lambda c: c.reshape(shape + (c.shape[-1],))
    return dec.Point(rs(P.X), rs(P.Y), rs(P.Z))


E_BITS = 256  # Fiat-Shamir challenge width (SHA-256)


def _clamp_exponents(shape, *pairs):
    """Police attacker-controlled proof fields before any device call.

    pairs: (array, max_bits).  Returns ([clamped...], ok_mask): any field
    that is negative or wider than max_bits is zeroed and its row marked
    failed — the verifier returns False instead of crashing in the
    exponent-class ladder (ADVICE r1)."""
    ok = np.ones(shape, dtype=bool)
    ok_flat = ok.reshape(-1)
    outs = []
    for arr, mb in pairs:
        a = np.broadcast_to(np.asarray(arr, dtype=object), shape).copy()
        flat = a.reshape(-1)
        for i, v in enumerate(flat.tolist()):
            v = int(v)
            if v < 0 or v.bit_length() > mb:
                flat[i] = 0
                ok_flat[i] = False
        outs.append(a)
    return outs, ok


def _invmod(a, mod) -> np.ndarray:
    from ..core import modctx as _m

    t0 = _m.time.perf_counter() if _m.PROFILE else 0.0
    a = np.asarray(a, dtype=object)
    mod = np.asarray(mod, dtype=object)
    shape = np.broadcast_shapes(a.shape, mod.shape)
    fa = np.broadcast_to(a, shape).reshape(-1)
    fm = np.broadcast_to(mod, shape).reshape(-1)
    out = np.empty(fa.shape[0], dtype=object)
    for b in range(fa.shape[0]):
        try:
            out[b] = pow(int(fa[b]), -1, int(fm[b]))
        except ValueError:
            out[b] = 0  # non-invertible -> verification will fail
    if _m.PROFILE:
        _m.PROFILE_LOG.append(
            ("host:invmod", fa.shape[0], 0, "-", _m.time.perf_counter() - t0)
        )
    return out.reshape(shape)


@dataclasses.dataclass
class AliceProofBatch:
    """(z, e, s, s1, s2) as in range_proofs.rs:92-100, plus the sigma
    commitments (u, w) on the wire: the verifier then checks the equivalent
    products w*z^e == h1^s1 h2^s2 and u*c^e == (s1 N+1) s^N instead of
    recomputing u, w with modular inverses (range_proofs.rs:105-156) — the
    hash binds (u, w) so soundness is identical, and the O(S) host-side
    invmod loop disappears from the hot path."""

    z: np.ndarray
    e: np.ndarray
    s: np.ndarray
    s1: np.ndarray
    s2: np.ndarray
    u: np.ndarray = None
    w: np.ndarray = None


def alice_prove(a_ints, cipher, ek: PaillierCtxBatch, stmt: DlogStatementBatch, r_ints, rng,
                r_t=None) -> AliceProofBatch:
    """a: plaintexts (< q); cipher: Enc(a); r: encryption randomness.

    r_t: the table exponent of r (r = g^(r_t), randomizer-table sampling):
    when given, the response s = r^e beta folds into ONE fixed-base power
    g^(r_t e + t_beta) and neither r nor beta is ever materialized on the
    honest path."""
    a = np.asarray(a_ints, dtype=object)
    shape = np.broadcast_shapes(a.shape, stmt.ctx.batch_shape, ek.n_ctx.batch_shape)
    n_t = np.broadcast_to(stmt.ctx.n_ints, shape)
    alpha = rng.below(Q3, shape)
    beta = beta_n_l = beta_t = None
    use_fold = ek.enc_tab_g is not None and r_t is not None
    # beta's sampling must match r's: if the caller supplied uniform r
    # (r_t is None), a table-sampled beta in <g> would make s = r^e beta
    # reveal the coset of r^e (ADVICE r4) — fall back to uniform units
    if use_fold:
        beta, beta_n_l, beta_t = ek.sample_unit_with_power(
            shape, rng, sync=False, defer_value=True, want_t=True
        )
    else:
        beta = rng.units_below(np.broadcast_to(ek.n, shape), shape)
    gamma = rng.below(Q3 * n_t, shape)
    rho = rng.below(Q * n_t, shape)

    tb = stmt.ctx.bits  # N_tilde width: sampling-domain exponent hints
    # honest plaintexts are < q (E_BITS); measure the actual width so a
    # dishonest prover (range_proofs.rs:560-582 out-of-range test) can still
    # PRODUCE a proof — the verifier's s1-range/width checks then reject it
    a_bits = max(
        E_BITS,
        max((int(v).bit_length() for v in a.reshape(-1).tolist()), default=1),
    )
    from ..core.modctx import resolve

    # dispatch all three independent launches before any sync (LazyInts);
    # beta^N takes the randomizer-table path (sampled above), else the
    # owner's CRT half-width path (the prover encrypts under its own key)
    z_l = stmt.pow_h1h2(a, rho, hints=(a_bits, E_BITS + tb), sync=False)
    if beta_n_l is None:
        if ek.sk_ctx is not None:
            beta_n_l = ek.pow_n_sk(beta, sync=False)
        else:
            beta_n_l = ek.nn_ctx.pow(
                beta, np.broadcast_to(ek.n, shape), ebits_hint=ek.n_ctx.bits, sync=False
            )
    w_l = stmt.pow_h1h2(alpha, gamma, hints=(768, 768 + tb), sync=False)
    u = _mulmod(
        alpha * np.broadcast_to(ek.n, shape) + 1, resolve(beta_n_l),
        np.broadcast_to(ek.nn, shape),
    )
    z, w = resolve(z_l), resolve(w_l)

    gen = np.broadcast_to(ek.n, shape) + 1
    e = digest_rows(np.broadcast_to(ek.n, shape), gen, cipher, z, u, w)

    if use_fold:
        s = resolve(ek.pow_enc_base(
            np.asarray(r_t, dtype=object) * e + beta_t,
            ebits_hint=ek.enc_table_max_ebits(ek.n_ctx.bits),
        ))
    else:
        s = _mulmod(ek.n_ctx.pow(r_ints, e, ebits_hint=E_BITS), beta,
                    np.broadcast_to(ek.n, shape))
    s1 = e * a + alpha
    s2 = e * rho + gamma
    return AliceProofBatch(z=z, e=e, s=s, s1=s1, s2=s2, u=u, w=w)


def _alice_host_checks(proof: AliceProofBatch, cipher, ek, stmt, shape):
    """Per-session host-side checks shared by the per-session and the
    cross-session (batch_verify) verifiers: s1 range, exponent-width
    clamping, and the Fiat-Shamir hash recomputation.

    -> (cheap_ok mask, clamped (e, s1, s2))."""
    n = np.broadcast_to(ek.n, shape)
    range_ok = np.vectorize(lambda v: int(v) <= Q3, otypes=[bool])(
        np.broadcast_to(np.asarray(proof.s1, dtype=object), shape)
    )
    tb = stmt.ctx.bits
    (e, s1, s2), width_ok = _clamp_exponents(
        shape, (proof.e, E_BITS), (proof.s1, 776), (proof.s2, 768 + tb + 16)
    )
    e_check = digest_rows(n, n + 1, cipher, proof.z, proof.u, proof.w)
    hash_ok = e_check == np.broadcast_to(np.asarray(proof.e, dtype=object), shape)
    return range_ok & width_ok & hash_ok, (e, s1, s2)


def alice_verify(proof: AliceProofBatch, cipher, ek: PaillierCtxBatch, stmt: DlogStatementBatch) -> np.ndarray:
    shape = np.broadcast_shapes(
        np.shape(proof.z), stmt.ctx.batch_shape, ek.n_ctx.batch_shape, np.shape(cipher)
    )
    n = np.broadcast_to(ek.n, shape)
    tb = stmt.ctx.bits

    # inverse-free form (see AliceProofBatch): w z^e == h1^s1 h2^s2 (mod N~)
    # and u c^e == (s1 N + 1) s^N (mod N^2), with e == H(..., u, w).
    # All four launches are independent: dispatch async, hash while the
    # device works, decode last (LazyInts).
    from ..core.modctx import resolve

    cheap_ok, (e, s1, s2) = _alice_host_checks(proof, cipher, ek, stmt, shape)
    lhs_w = stmt.ctx.pow_prod(
        [proof.z], [e], ebits_hints=(E_BITS,), mults=[proof.w], sync=False
    )
    rhs_w = stmt.pow_h1h2(s1, s2, hints=(776, 768 + tb + 16), sync=False)
    lhs_u = ek.nn_ctx.pow_prod(
        [cipher], [e], ebits_hints=(E_BITS,), mults=[proof.u], sync=False
    )
    rhs_u = ek.nn_ctx.pow_prod(
        [proof.s], [n], ebits_hints=(ek.n_ctx.bits,), mults=[s1 * n + 1], sync=False
    )
    return cheap_ok & (resolve(lhs_w) == resolve(rhs_w)) & (resolve(lhs_u) == resolve(rhs_u))


@dataclasses.dataclass
class BobProofBatch:
    """(t, z, e, s, s1, s2, t1, t2) as in range_proofs.rs:300-316, plus the
    sigma commitments (z_prim, v, w) on the wire so the verifier checks the
    inverse-free products (see AliceProofBatch for the rationale):
      z_prim * z^e == h1^s1 h2^s2,  w * t^e == h1^t1 h2^t2   (mod N~)
      v * c^e == c_a^s1 s^N (t1 N + 1)                       (mod N^2)
    """

    t: np.ndarray
    z: np.ndarray
    e: np.ndarray
    s: np.ndarray
    s1: np.ndarray
    s2: np.ndarray
    t1: np.ndarray
    t2: np.ndarray
    z_prim: np.ndarray = None
    v: np.ndarray = None
    w: np.ndarray = None
    # wc ("with check") extension: u = alpha G as affine coordinate pairs
    u_x: np.ndarray | None = None
    u_y: np.ndarray | None = None


def bob_prove(
    b_ints,
    beta_prim,
    a_enc,
    mta_enc,
    r_ints,
    ek: PaillierCtxBatch,
    stmt: DlogStatementBatch,
    rng,
    check: bool = False,
    X_pts=None,  # affine (x, y) object arrays, required when check=True
    r_is_table: bool = False,  # True iff r_ints was table-sampled (r = g^t)
) -> BobProofBatch:
    b_arr = np.asarray(b_ints, dtype=object)
    shape = np.broadcast_shapes(b_arr.shape, stmt.ctx.batch_shape, ek.n_ctx.batch_shape)
    n_t = np.broadcast_to(stmt.ctx.n_ints, shape)
    n = np.broadcast_to(ek.n, shape)
    nn = np.broadcast_to(ek.nn, shape)

    alpha = rng.below(Q3, shape)
    beta = beta_n_l = None
    # beta's sampling must match r's (see alice_prove): table-beta only
    # when the caller's r was itself table-sampled
    if ek.enc_tab_g is not None and r_is_table:
        beta, beta_n_l = ek.sample_unit_with_power(shape, rng, sync=False)
    else:
        beta = rng.units_below(n, shape)
    gamma = rng.below(Q * Q * n, shape)
    rho = rng.below(Q * n_t, shape)
    rho_prim = rng.below(Q3 * n_t, shape)
    sigma = rng.below(Q * n_t, shape)
    tau = rng.below(Q3 * n_t, shape)

    tb = stmt.ctx.bits
    pb = ek.n_ctx.bits
    from ..core.modctx import resolve

    # five independent launches: dispatch all async, decode after (LazyInts)
    z_l = stmt.pow_h1h2(b_arr, rho, hints=(E_BITS, E_BITS + tb), sync=False)
    zp_l = stmt.pow_h1h2(alpha, rho_prim, hints=(768, 768 + tb), sync=False)
    t_l = stmt.pow_h1h2(beta_prim, sigma, hints=(pb, E_BITS + tb), sync=False)
    w_l = stmt.pow_h1h2(gamma, tau, hints=(512 + pb, 768 + tb), sync=False)
    if beta_n_l is not None:
        v_l = ek.nn_ctx.pow_prod(
            [a_enc], [alpha], ebits_hints=(768,),
            mults=[resolve(beta_n_l), gamma * n + 1], sync=False,
        )
    else:
        v_l = ek.nn_ctx.pow_prod(
            [a_enc, beta], [alpha, n], ebits_hints=(768, pb),
            mults=[gamma * n + 1], sync=False,
        )
    z, z_prim, t, w = resolve(z_l), resolve(zp_l), resolve(t_l), resolve(w_l)
    v = resolve(v_l)

    gen = n + 1
    hash_cols = [n, gen, a_enc, mta_enc, z, z_prim, t, v, w]
    u_x = u_y = None
    if check:
        from ..ec import secp256k1 as dec
        from ..core.limbs import batch_from_limbs

        alpha_pts = dec.mul_generator(dec.sc_from_ints(np.mod(alpha, Q)))
        ux_l, uy_l, _ = dec.to_affine(alpha_pts)
        u_x = batch_from_limbs(np.asarray(ux_l))
        u_y = batch_from_limbs(np.asarray(uy_l))
        X_x, X_y = X_pts
        hash_cols += [np.broadcast_to(np.asarray(X_x, dtype=object), shape),
                      np.broadcast_to(np.asarray(X_y, dtype=object), shape),
                      u_x, u_y]
    e = digest_rows(*hash_cols)

    s = _mulmod(ek.n_ctx.pow(r_ints, e, ebits_hint=E_BITS), beta, n)
    s1 = e * b_arr + alpha
    s2 = e * rho + rho_prim
    t1 = e * np.broadcast_to(np.asarray(beta_prim, dtype=object), shape) + gamma
    t2 = e * sigma + tau
    return BobProofBatch(
        t=t, z=z, e=e, s=s, s1=s1, s2=s2, t1=t1, t2=t2,
        z_prim=z_prim, v=v, w=w, u_x=u_x, u_y=u_y,
    )


def bob_verify(
    proof: BobProofBatch,
    a_enc,
    mta_enc,
    ek: PaillierCtxBatch,
    stmt: DlogStatementBatch,
    X_pts=None,  # (x, y) affine arrays of X = b G for the wc variant
) -> np.ndarray:
    shape = np.broadcast_shapes(np.shape(proof.z), stmt.ctx.batch_shape, ek.n_ctx.batch_shape)
    n_t = np.broadcast_to(stmt.ctx.n_ints, shape)
    n = np.broadcast_to(ek.n, shape)
    nn = np.broadcast_to(ek.nn, shape)

    range_ok = np.vectorize(lambda v: int(v) <= Q3, otypes=[bool])(
        np.broadcast_to(np.asarray(proof.s1, dtype=object), shape)
    )
    tb = stmt.ctx.bits
    pb = ek.n_ctx.bits
    (e, s1, s2, t1, t2), width_ok = _clamp_exponents(
        shape,
        (proof.e, E_BITS),
        (proof.s1, 776),
        (proof.s2, 768 + tb + 16),
        (proof.t1, 512 + pb + 16),
        (proof.t2, 768 + tb + 16),
    )

    # inverse-free form (see BobProofBatch).  z and t share the modulus and
    # exponent width, so both mod-N~ product LHSs run as one stacked launch;
    # all five launches are independent -> async dispatch, decode last.
    from ..core.modctx import resolve

    lhs_zt_l = stmt.ctx.pow_prod(
        [np.stack([np.broadcast_to(proof.z, shape), np.broadcast_to(proof.t, shape)])],
        [np.broadcast_to(e, (2,) + shape)],
        ebits_hints=(E_BITS,),
        mults=[np.stack([np.broadcast_to(proof.z_prim, shape),
                         np.broadcast_to(proof.w, shape)])],
        sync=False,
    )
    rhs_z_l = stmt.pow_h1h2(s1, s2, hints=(776, 768 + tb + 16), sync=False)
    rhs_t_l = stmt.pow_h1h2(t1, t2, hints=(512 + pb + 16, 768 + tb + 16), sync=False)
    lhs_v_l = ek.nn_ctx.pow_prod(
        [mta_enc], [e], ebits_hints=(E_BITS,), mults=[proof.v], sync=False
    )
    rhs_v_l = ek.nn_ctx.pow_prod(
        [a_enc, proof.s], [s1, n], ebits_hints=(776, pb), mults=[t1 * n + 1], sync=False
    )
    hash_cols = [n, n + 1, a_enc, mta_enc, proof.z, proof.z_prim, proof.t, proof.v, proof.w]
    wc_ok = np.ones(shape, dtype=bool)
    if X_pts is not None:
        X_x, X_y = (np.broadcast_to(np.asarray(c, dtype=object), shape) for c in X_pts)
        u_x = np.broadcast_to(np.asarray(proof.u_x, dtype=object), shape)
        u_y = np.broadcast_to(np.asarray(proof.u_y, dtype=object), shape)
        hash_cols += [X_x, X_y, u_x, u_y]
        # EC check: s1 G == e X + u
        from ..ec import secp256k1 as dec

        s1_pts = dec.mul_generator(dec.sc_from_ints(np.mod(np.broadcast_to(np.asarray(proof.s1, dtype=object), shape), Q)))
        e_mod = np.mod(np.broadcast_to(np.asarray(proof.e, dtype=object), shape), Q)
        X_dev = pts_from_xy(X_x, X_y)
        u_dev = pts_from_xy(u_x, u_y)
        rhs = dec.point_add(dec.scalar_mul(dec.sc_from_ints(e_mod), X_dev), u_dev)
        wc_ok = np.asarray(dec.point_eq(s1_pts, rhs))
    e_check = digest_rows(*hash_cols)
    lhs_zt = resolve(lhs_zt_l)
    eq_ok = (
        (lhs_zt[0] == resolve(rhs_z_l))
        & (lhs_zt[1] == resolve(rhs_t_l))
        & (resolve(lhs_v_l) == resolve(rhs_v_l))
    )
    return (
        range_ok
        & width_ok
        & wc_ok
        & eq_ok
        & (e_check == np.broadcast_to(np.asarray(proof.e, dtype=object), shape))
    )


def obj_mod(x, m) -> np.ndarray:
    """x mod m keeping object dtype at any shape, incl. 0-d (np.mod on a 0-d
    object array decays to a raw python bigint and overflows C long)."""
    return np.vectorize(lambda v: int(v) % m, otypes=[object])(
        np.asarray(x, dtype=object)
    )
