"""Batched Feldman verifiable secret sharing.

curv `VerifiableSS` rebuilt batch-first (reference call sites:
gg_2018/party_i.rs:233-291, gg_2020/party_i.rs:313-314).

Conventions (matching curv):
  * a degree-t polynomial p(X) = secret + a1 X + ... + at X^t over Z_q;
  * party with 0-based index i holds share p(i+1);
  * commitments C_k = a_k G, C_0 = secret G;
  * share validation: share * G == sum_k (i+1)^k C_k;
  * `map_share_to_new_params(index, s)` = Lagrange coefficient at 0 for
    evaluation points {j+1 : j in s} — host-side python int math (tiny).

Device work: polynomial evaluation (Horner over the scalar field) and the
commitment checks (Horner over points with small static multipliers).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax.numpy as jnp

from ..ec import secp256k1 as ec
from ..host import ec as hec

Q = hec.N


@dataclasses.dataclass
class VssSchemeBatch:
    """t, n plus commitment points [..., t+1] (pytree of [..., t+1, 16])."""

    t: int
    n: int
    commitments: ec.Point


def _stack_points(pts):
    """list of Point batches -> Point with new axis before the limb axis."""
    return ec.Point(
        jnp.stack([p.X for p in pts], axis=-2),
        jnp.stack([p.Y for p in pts], axis=-2),
        jnp.stack([p.Z for p in pts], axis=-2),
    )


def point_index(P: ec.Point, k: int) -> ec.Point:
    return ec.Point(P.X[..., k, :], P.Y[..., k, :], P.Z[..., k, :])


def scalar_mul_int(k: int, P: ec.Point) -> ec.Point:
    """k*P for a small static non-negative int (trace-time double-and-add)."""
    if k == 0:
        return ec.point_infinity(P.X.shape[:-1])
    acc = None
    base = P
    kk = k
    while kk:
        if kk & 1:
            acc = base if acc is None else ec.point_add(acc, base)
        kk >>= 1
        if kk:
            base = ec.point_double(base)
    return acc


def share(t: int, n: int, secret_ints, rng):
    """Share a batch of secrets -> (VssSchemeBatch, shares [..., n] ints).

    secret_ints: object ndarray [...] of ints < q.
    Returns shares as an object ndarray [..., n] (party j holds [..., j]).
    """
    secret = np.asarray(secret_ints, dtype=object)
    shape = secret.shape
    coeffs = [secret] + [rng.scalars(shape) for _ in range(t)]
    # commitments, batched scalar mul per coefficient
    G = ec.generator(shape)
    comms = _stack_points([ec.mul_generator(ec.sc_from_ints(c)) for c in coeffs])
    # Horner evaluation at x = 1..n (host int math is exact and cheap here;
    # the per-share work is O(t) multiplies of 256-bit ints)
    shares = np.empty(shape + (n,), dtype=object)
    flat_secret = secret.reshape(-1)
    flat_coeffs = [np.asarray(c, dtype=object).reshape(-1) for c in coeffs]
    flat_shares = shares.reshape(-1, n)
    for b in range(flat_secret.shape[0]):
        cs = [int(c[b]) for c in flat_coeffs]
        for j in range(1, n + 1):
            acc = 0
            for c in reversed(cs):
                acc = (acc * j + c) % Q
            flat_shares[b, j - 1] = acc
    return VssSchemeBatch(t=t, n=n, commitments=comms), shares


def commitment_eval(scheme: VssSchemeBatch, index0: int) -> ec.Point:
    """sum_k (index0+1)^k C_k — the public value of party index0's share."""
    x = index0 + 1
    t = scheme.t
    acc = point_index(scheme.commitments, t)
    for k in range(t - 1, -1, -1):
        acc = ec.point_add(scalar_mul_int(x, acc), point_index(scheme.commitments, k))
    return acc


def validate_share(scheme: VssSchemeBatch, share_ints, index0: int) -> np.ndarray:
    """share * G == sum_k (index0+1)^k C_k, batched -> bool ndarray."""
    lhs = ec.mul_generator(ec.sc_from_ints(share_ints))
    rhs = commitment_eval(scheme, index0)
    return np.asarray(ec.point_eq(lhs, rhs))


def lagrange_coeff(index0: int, s: list[int]) -> int:
    """map_share_to_new_params: Lagrange basis at 0 for party `index0`
    over signer subset s (0-based indices)."""
    xi = index0 + 1
    num, den = 1, 1
    for j in s:
        if j == index0:
            continue
        xj = j + 1
        num = num * xj % Q
        den = den * ((xj - xi) % Q) % Q
    return num * pow(den, -1, Q) % Q


def reconstruct(s: list[int], shares: list[int]) -> int:
    """Host-side Lagrange reconstruction at 0 (test/recovery path)."""
    acc = 0
    for idx, sh in zip(s, shares):
        acc = (acc + lagrange_coeff(idx, s) * sh) % Q
    return acc
