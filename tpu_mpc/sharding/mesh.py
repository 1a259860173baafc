"""Multi-chip session-batch data parallelism (SURVEY §2.3 workhorse).

The reference's concurrency model is n OS processes, one per MPC party
(demo/run.sh:22-35) — there is nothing to shard.  The TPU-native analog is
the *sessions* axis: thousands of concurrent signing sessions execute each
round's kernel as one batched launch, and that batch axis is partitioned
over a 1-D device mesh with `jax.sharding.NamedSharding`.

Integration point: every device launch in the framework funnels through
`ModCtx.pow/pow_prod/pow_fixed_prod` (core/modctx.py) and the secp256k1
kernels, all of which flatten their operands to a leading batch axis.  When
a mesh is active, those flattened operands are `device_put` with a
`P("sessions", None, ...)` sharding, so XLA partitions the compiled kernel
SPMD across the mesh — no per-kernel pjit plumbing, no communication inside
the modexp (sessions are independent), collectives only where the protocol
itself aggregates.

Per-round aggregation points (Σδ_i mod q, Σ g^{γ_i}, ΣS_i, R̄-sum —
reference gg_2020/party_i.rs:635-640,768-776,835-848) reduce over the
*party* axis, which lives inside each session shard: with sessions-DP they
lower to purely local reductions, the layout that keeps ICI traffic at
zero.  Sharding the party axis instead (mp-style) is exercised by
__graft_entry__.dryrun_multichip, where the same aggregations lower to
XLA all-reduces over the mesh.

Usage:
    mesh = sessions_mesh()                   # all visible devices
    with use_mesh(mesh):
        off = gg20.offline_stage(key, [0, 1], rng)   # kernels run SPMD
"""

from __future__ import annotations

import contextlib
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """TPU_MPC_DISTRIBUTED=1: bring up jax.distributed from the standard
    coordinator env vars so `jax.devices()` (and thus sessions_mesh()) spans
    every host — the one-flag multi-host path.  Sessions-DP needs no other
    change: shard_flat partitions the same way over the global mesh, and the
    sessions axis has no cross-device collectives."""
    if os.environ.get("TPU_MPC_DISTRIBUTED") != "1":
        return False
    jax.distributed.initialize()
    return True

_ACTIVE: Mesh | None = None

AXIS = "sessions"


def sessions_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the sessions axis (first n_devices visible devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def activate(mesh: Mesh) -> None:
    global _ACTIVE
    _ACTIVE = mesh


def deactivate() -> None:
    global _ACTIVE
    _ACTIVE = None


def current_mesh() -> Mesh | None:
    return _ACTIVE


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    prev = _ACTIVE
    activate(mesh)
    try:
        yield mesh
    finally:
        activate(prev)


def shard_flat(x):
    """Shard a flattened [B, ...] operand over the active mesh's sessions
    axis.  No-op when no mesh is active or B doesn't divide evenly (tiny
    batches stay single-device — the padding in modctx guarantees pow-of-2
    B, so any B >= mesh.size shards)."""
    mesh = _ACTIVE
    if mesh is None or x.ndim == 0 or x.shape[0] % mesh.size != 0:
        return x
    spec = P(AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_leading(x, batch_shape: tuple):
    """Shard an un-flattened array whose leading axes are `batch_shape` on
    the FIRST batch axis (the sessions axis of [S, n, ...] layouts)."""
    mesh = _ACTIVE
    if mesh is None or not batch_shape or batch_shape[0] % mesh.size != 0:
        return x
    spec = P(AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
