"""Recursive proof verification: an outer circuit verifies an inner proof
(reference plonky2/src/recursion/recursive_verifier.rs tests)."""

import pytest

from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify
from plonky2_goldibear_tpu.recursion import recursive_verifier as rv


def build_inner():
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    ia = builder.add_virtual_target()
    ib = builder.add_virtual_target()
    builder.register_public_input(ia)
    builder.register_public_input(ib)
    a, b = ia, ib
    for _ in range(50):
        a, b = b, builder.add(a, b)
    builder.register_public_input(a)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(ia, 0)
    pw.set_target(ib, 1)
    return data, data.prove(pw)


@pytest.mark.slow
def test_recursive_verification():
    seed_randomness(2024)
    inner_data, inner_proof = build_inner()
    verify(inner_proof, inner_data.verifier_only, inner_data.common)

    config = CircuitConfig.standard_recursion_config_gl()
    outer = CircuitBuilder(config)
    proof_t = rv.add_virtual_proof_with_pis(outer, inner_data.common)
    vk_t = rv.add_virtual_verifier_data(
        outer, inner_data.common.config.fri_config.cap_height)
    rv.verify_proof(outer, proof_t, vk_t, inner_data.common)
    # expose the inner public inputs as outer public inputs
    outer.register_public_inputs(proof_t.public_inputs)

    outer_data = outer.build()
    pw = PartialWitness()
    rv.set_proof_with_pis_target(pw, proof_t, inner_proof)
    rv.set_verifier_data_target(pw, vk_t, inner_data.verifier_only)
    outer_proof = outer_data.prove(pw)
    assert outer_proof.public_inputs == inner_proof.public_inputs
    verify(outer_proof, outer_data.verifier_only, outer_data.common)
