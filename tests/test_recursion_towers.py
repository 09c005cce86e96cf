"""Recursion towers: double recursion (shrink chain) and multi-hash
(Keccak-outer) recursion, mirroring the reference tests
recursive_verifier.rs:415-483 (test_recursive_recursive_verifier_gl) and
:623-664 (test_recursive_verifier_multi_hash), with the dummy_proof /
recursive_proof helpers of recursive_verifier.rs:666-697,895-955 at
smaller sizes (compile-time budget; the tower structure is identical).
"""

import pytest

from plonky2_goldibear_tpu.gates.basic_gates import NoopGate
from plonky2_goldibear_tpu.gates.poseidon import PoseidonGate
from plonky2_goldibear_tpu.hash import keccak_hasher
from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk import serialization as serde
from plonky2_goldibear_tpu.plonk.compression import compress, decompress
from plonky2_goldibear_tpu.recursion import recursive_verifier as rv


def dummy_proof(config, num_dummy_gates):
    """reference recursive_verifier.rs:666-697: NoopGate rows + the field's
    Poseidon gate added to the gate set (so towers over this proof share a
    gate basis), hash-count zero public inputs."""
    builder = CircuitBuilder(config)
    for _ in range(num_dummy_gates):
        builder.add_gate(NoopGate(), [])
    builder.add_gate_to_gate_set(PoseidonGate())
    zero = builder.zero()
    builder.register_public_inputs(
        [zero] * builder.spec.num_hash_out_elts)
    data = builder.build()
    proof = data.prove(PartialWitness())
    data.verify(proof)
    return proof, data.verifier_only, data.common


def recursive_proof(inner_proof, inner_vd, inner_cd, config,
                    min_degree_bits=None, hasher=None):
    """reference recursive_verifier.rs:895-955 (generic over the outer
    config: ``hasher`` selects the outer Merkle/transcript hasher)."""
    builder = CircuitBuilder(config, hasher=hasher)
    pw = PartialWitness()
    pt = rv.add_virtual_proof_with_pis(builder, inner_cd)
    rv.set_proof_with_pis_target(pw, pt, inner_proof)
    vk_t = rv.add_virtual_verifier_data(
        builder, inner_cd.config.fri_config.cap_height)
    rv.set_verifier_data_target(pw, vk_t, inner_vd)
    rv.verify_proof(builder, pt, vk_t, inner_cd)

    if min_degree_bits is not None:
        # reference :924-931 — pad to 2^(b-1)+1; build() pads the rest
        min_gates = (1 << (min_degree_bits - 1)) + 1
        for _ in range(builder.num_gates(), min_gates):
            builder.add_gate(NoopGate(), [])

    data = builder.build()
    proof = data.prove(pw)
    data.verify(proof)
    return proof, data.verifier_only, data.common


def check_serialization(proof, vd, common):
    """reference recursive_verifier.rs:955-994: bytes round-trip +
    compress/decompress round-trip."""
    raw = serde.write_proof_with_public_inputs(proof, common)
    back = serde.read_proof_with_public_inputs(raw, common)
    assert back == proof
    cp = compress(proof, vd, common)
    assert decompress(cp, vd, common) == proof


@pytest.fixture(scope="module")
def dummy_gl():
    seed_randomness(20260818)
    config = CircuitConfig.standard_recursion_config_gl()
    return dummy_proof(config, 1000)


@pytest.fixture(scope="module")
def rec1_gl(dummy_gl):
    proof, vd, cd = dummy_gl
    config = CircuitConfig.standard_recursion_config_gl()
    # first shrink step padded to a fixed 2^13 (reference pins 14 -> 13)
    return recursive_proof(proof, vd, cd, config, min_degree_bits=13)


@pytest.mark.slow
def test_double_recursion_gl(dummy_gl, rec1_gl):
    """reference recursive_verifier.rs:415-483 at reduced size: dummy ->
    padded recursive proof -> second recursive proof, degree shrinking back
    down the chain, serialization at the end."""
    _, _, cd0 = dummy_gl
    assert cd0.degree_bits == 10

    proof1, vd1, cd1 = rec1_gl
    assert cd1.degree_bits == 13

    config = CircuitConfig.standard_recursion_config_gl()
    proof2, vd2, cd2 = recursive_proof(proof1, vd1, cd1, config)
    # the double-recursive verifier must not outgrow its padded inner
    assert cd2.degree_bits <= cd1.degree_bits
    check_serialization(proof2, vd2, cd2)


@pytest.mark.slow
def test_proof_merge(dummy_gl):
    """One circuit verifying TWO inner proofs (the reference's merge bench,
    benches/recursion.rs:205-270: two proofs of the same inner circuit
    verified side by side in a single outer circuit)."""
    proof_a, vd, cd = dummy_gl
    # a second, independently-proven instance of the same circuit
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    pw = PartialWitness()
    for inner in (proof_a, proof_a):
        pt = rv.add_virtual_proof_with_pis(builder, cd)
        rv.set_proof_with_pis_target(pw, pt, inner)
        vk_t = rv.add_virtual_verifier_data(
            builder, cd.config.fri_config.cap_height)
        rv.set_verifier_data_target(pw, vk_t, vd)
        rv.verify_proof(builder, pt, vk_t, cd)
    data = builder.build()
    merged = data.prove(pw)
    data.verify(merged)


@pytest.mark.slow
def test_multi_hash_recursion(dummy_gl, rec1_gl):
    """reference recursive_verifier.rs:623-664: wrap a Poseidon-config
    recursive proof in a Keccak-outer circuit (Hasher=Keccak for Merkle
    trees + transcript, InnerHasher=Poseidon in-circuit)."""
    proof1, vd1, cd1 = rec1_gl
    config = CircuitConfig.standard_recursion_config_gl()
    proof_k, vd_k, cd_k = recursive_proof(
        proof1, vd1, cd1, config, hasher=keccak_hasher)
    assert isinstance(vd_k.circuit_digest, bytes)
    assert all(isinstance(d, bytes) for d in proof_k.proof.wires_cap)
    # BytesHash serde round-trip (reference test_serialization at :655-663;
    # read/write generic over H::HASH_SIZE, mod.rs:253-262)
    raw = serde.write_proof_with_public_inputs(proof_k, cd_k)
    back = serde.read_proof_with_public_inputs(
        raw, cd_k, hasher=keccak_hasher)
    assert back == proof_k
    vk_raw = serde.write_verifier_only_circuit_data(vd_k, cd_k.spec)
    vk_back = serde.read_verifier_only_circuit_data(
        vk_raw, cd_k.spec, hasher=keccak_hasher)
    assert vk_back.circuit_digest == vd_k.circuit_digest
    assert vk_back.constants_sigmas_cap == vd_k.constants_sigmas_cap
