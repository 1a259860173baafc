"""Host-side (python-int) cryptography.

Two roles:
  1. Golden oracle for differential testing of the TPU limb kernels.
  2. The actual implementation for inherently host-side work: prime search
     (data-dependent), one-off setup proofs, wire serialization, and the
     low-QPS paths (centipede backup, class groups).
"""

from . import ec, primes, paillier, serde  # noqa: F401
