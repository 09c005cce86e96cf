"""Byte serialization parity: compressed proofs and prover-only checkpoint
(reference plonk/proof.rs:111-151 to_bytes/from_bytes;
circuit_data.rs:348-365; util/serialization/mod.rs:1102-1230)."""

import numpy as np
import pytest

from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk import compression
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.serialization import (
    read_compressed_proof_with_public_inputs,
    read_prover_only_circuit_data,
    write_compressed_proof_with_public_inputs,
    write_prover_only_circuit_data,
    write_proof_with_public_inputs)
from plonky2_goldibear_tpu.plonk.verifier import verify


@pytest.fixture(scope="module")
def small_circuit():
    seed_randomness(11)
    b = CircuitBuilder(CircuitConfig.standard_recursion_config_gl())
    x = b.add_virtual_target()
    b.register_public_input(x)
    cur = x
    for _ in range(60):
        cur = b.arithmetic(1, 1, cur, cur, cur)
    b.register_public_input(cur)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 3)
    proof = data.prove(pw)
    verify(proof, data.verifier_only, data.common)
    return data, proof


def test_compressed_proof_bytes_roundtrip(small_circuit):
    data, proof = small_circuit
    cp = compression.compress(proof, data.verifier_only, data.common)
    blob = write_compressed_proof_with_public_inputs(cp, data.common)
    cp2 = read_compressed_proof_with_public_inputs(blob, data.common)
    blob2 = write_compressed_proof_with_public_inputs(cp2, data.common)
    assert blob == blob2
    # decompressed proof must verify and re-serialize identically
    restored = compression.decompress(cp2, data.verifier_only, data.common)
    verify(restored, data.verifier_only, data.common)
    assert write_proof_with_public_inputs(restored, data.common) == \
        write_proof_with_public_inputs(proof, data.common)
    # compressed bytes are smaller (path dedup + inferred evals)
    assert len(blob) < len(write_proof_with_public_inputs(proof, data.common))


def test_prover_only_checkpoint_roundtrip(small_circuit):
    data, proof = small_circuit
    blob = write_prover_only_circuit_data(data.prover_only, data.common)
    pd2 = read_prover_only_circuit_data(blob, data.common)
    blob2 = write_prover_only_circuit_data(pd2, data.common)
    assert blob == blob2
    # a prover restored from checkpoint bytes produces valid proofs with
    # identical commitments (the rebuilt constants/sigmas tree is bit-exact)
    assert pd2.constants_sigmas_commitment.cap_host() == \
        data.prover_only.constants_sigmas_commitment.cap_host()
    from plonky2_goldibear_tpu.plonk import prover

    pw = PartialWitness()
    pw.set_target(data.prover_only.public_inputs[0], 5)
    p2 = prover.prove(pd2, data.common, pw)
    verify(p2, data.verifier_only, data.common)
