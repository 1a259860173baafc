"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised by bench.py; tests must be hermetic and
exercise the multi-chip sharding path via xla_force_host_platform_device_count
(the same mechanism the driver's dryrun uses).

RUN VIA `make test` (one pytest process per file): this environment's
jaxlib CPU backend segfaults compiling a fresh kernel after roughly 30-40
tests' worth of accumulated in-process compiled programs — a single
`pytest tests/` process crashes partway through (reproduced at different
tests purely as a function of compile count), while every file passes in
isolation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# force (not setdefault): the ambient environment pins JAX_PLATFORMS=axon
# (the tunneled TPU); tests must be hermetic on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# NOTE: JAX_COMPILATION_CACHE_DIR is deliberately NOT set — with this
# jax/XLA build the persistent cache makes CPU compiles pathologically slow
# (>3x the uncached compile).  Shape canonicalization in the kernels keeps
# the number of distinct in-process compiles small instead.

# The axon TPU plugin ignores the JAX_PLATFORMS env override, so force the
# CPU backend through jax.config as well (must happen before any jax op).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
