"""Shared parsing for the PLONKY2_TPU_DISABLE_* kill switches.

These switches gate trace-time dispatch to the Pallas kernels in ``ops/``
(they exist to bisect on-TPU correctness issues kernel-by-kernel).  Note
they are read at *trace time*: flipping one in a live process does not
affect already-jitted programs — set them before the first prove.

Switches (each forces the pure-jnp path for its kernel family):
- PLONKY2_TPU_DISABLE_NTT      — ops/ntt.py fused NTT
- PLONKY2_TPU_DISABLE_POSEIDON — ops/poseidon_gl.py permute/sponge kernels,
  including their use inside the fused Merkle level builder (so this switch
  removes ALL Poseidon Pallas code from the trace)
- PLONKY2_TPU_DISABLE_MERKLE   — the fused Merkle tree-tail/level kernels
  only (two_to_one still dispatches per-level Poseidon kernels)
"""

import os


def env_flag(name: str) -> bool:
    """True only for explicit truthy values ('1', 'true', 'yes', 'on')."""
    return os.environ.get(name, "").strip().lower() in (
        "1", "true", "yes", "on")
