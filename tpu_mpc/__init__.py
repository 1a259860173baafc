"""tpu_mpc — TPU-native threshold ECDSA (capabilities of ZenGo-X/multi-party-ecdsa).

A brand-new JAX/XLA/Pallas framework: batched, constant-shape, branch-free
cryptographic kernels (limbed bignum, Montgomery modexp, secp256k1, Paillier,
the GG18/GG20 ZK gadget set) vmapped/sharded over thousands of concurrent MPC
sessions, with a host-side round-orchestration runtime (state machines, relay
transport, blame protocols).

Layer map (mirrors the behavior of the reference layers, SURVEY.md §1):
  core/      limbed bignum + Montgomery kernels      (ref: curv BigInt + GMP)
  ec/        secp256k1 field/scalar/point kernels    (ref: curv secp256k1)
  hashes/    SHA-256 + curv-compatible serialization (ref: curv DigestExt)
  paillier/  Paillier cryptosystem                   (ref: kzen-paillier)
  zk/        sigma proofs, range proofs, PDL, ...    (ref: curv proofs, zk-paillier, in-tree utilities)
  vss/       Feldman verifiable secret sharing       (ref: curv VerifiableSS)
  mta/       MtA / MtAwc gadget                      (ref: src/utilities/mta)
  protocols/ gg18, gg20 (+blame), lindell17, cclst19 (ref: src/protocols)
  runtime/   state machines, simulation, relay       (ref: round-based crate + examples)
  sharding/  device mesh + session-axis partitioning (new: TPU-native scale-out)
"""

__version__ = "0.1.0"
