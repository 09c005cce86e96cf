"""plonky2_goldibear_tpu — a TPU-native recursive SNARK proving stack.

A from-scratch JAX/XLA/Pallas implementation of a PLONK + FRI proving system
with the capability surface of the reference Rust stack
(telosnetwork/plonky2_goldibear): recursive SNARKs generic over two-adic base
fields — Goldilocks (p = 2^64 - 2^32 + 1, quadratic extension, Poseidon
width-12) and BabyBear (p = 2^31 - 2^27 + 1, quartic extension, Poseidon2
width-16).

Architecture (TPU-first, NOT a port of the reference):

- ``field/``   — host (python-int) field tower + device (jnp u32-limb) kernels,
                 NTT/LDE, polynomial ops.  Device Goldilocks elements are
                 (lo, hi) uint32 pairs; BabyBear is Montgomery-form uint32.
- ``ops/``     — Pallas TPU kernels for the hot paths (NTT butterflies,
                 Poseidon rounds, Merkle levels) plus pure-jnp references.
- ``hash/``    — Poseidon-GL, Poseidon2-BB, Keccak, Merkle tree/cap,
                 Fiat-Shamir challenger.
- ``iop/``     — targets, witness containers, generator dataflow scheduler
                 (host-side; the dense witness matrix is the device input).
- ``gates/``   — gate constraint definitions written once over a generic
                 commutative-ring interface and instantiated for host
                 extension-field eval, device batched base-field eval, and
                 in-circuit (recursive) eval.
- ``plonk/``   — circuit builder, circuit data, prover (batched/jitted device
                 phases), native verifier, vanishing-polynomial evaluation.
- ``fri/``     — FRI commit/fold/query prover and verifier.
- ``gadgets/`` — circuit std-lib (arithmetic, select, random access, range
                 checks, lookups, hashing gadgets).
- ``recursion/`` — in-circuit proof verification, conditional + cyclic (IVC)
                 recursion, dummy circuits.
- ``parallel/`` — jax.sharding Mesh layouts; multi-chip sharding of LDE,
                 Merkle, quotient evaluation and batch-of-proofs DP.
- ``utils/``   — serialization, timing tree, misc.
- ``models/``  — example circuits (factorial, fibonacci, range-check,
                 square-root) and the recursion benchmark circuit.
"""

__version__ = "0.1.0"
