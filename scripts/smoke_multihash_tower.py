"""Smoke-run the recursion-tower helpers at minimum size: tiny dummy proof
-> Keccak-outer recursive proof (exercises the inner-hasher RecursiveChallenger
fix + BytesHash serde), mirroring tests/test_recursion_towers.py at the
smallest scale that still compiles a full recursive verifier."""

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import conftest  # noqa: F401  (forces CPU platform + virtual devices)
from plonky2_goldibear_tpu.hash import keccak_hasher
from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.plonk import serialization as serde
from plonky2_goldibear_tpu.plonk.config import CircuitConfig

from test_recursion_towers import dummy_proof, recursive_proof

t0 = time.time()
seed_randomness(7)
config = CircuitConfig.standard_recursion_config_gl()
proof, vd, cd = dummy_proof(config, 100)
print(f"dummy: degree_bits={cd.degree_bits} t={time.time()-t0:.1f}s",
      flush=True)

t1 = time.time()
proof_k, vd_k, cd_k = recursive_proof(proof, vd, cd, config,
                                      hasher=keccak_hasher)
print(f"keccak-outer recursive proof: degree_bits={cd_k.degree_bits} "
      f"t={time.time()-t1:.1f}s", flush=True)
assert isinstance(vd_k.circuit_digest, bytes)

raw = serde.write_proof_with_public_inputs(proof_k, cd_k)
back = serde.read_proof_with_public_inputs(raw, cd_k, hasher=keccak_hasher)
assert back == proof_k
print(f"bytes serde round-trip ok ({len(raw)} bytes); total "
      f"{time.time()-t0:.1f}s")
