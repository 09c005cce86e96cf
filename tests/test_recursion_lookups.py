"""Recursive verification of a proof with lookups
(reference recursive_verifier.rs:341-413 test_recursive_verifier_lookup)."""

import pytest

from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify
from plonky2_goldibear_tpu.recursion import recursive_verifier as rv

TIP5_16 = [0, 7, 26, 63, 124, 215, 85, 254, 214, 228, 45, 185, 140, 173,
           33, 240]


def build_lookup_inner():
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    lut = builder.add_lookup_table_from_table(list(range(16)), TIP5_16)
    ins = [builder.add_virtual_target() for _ in range(3)]
    outs = [builder.add_lookup_from_index(t, lut) for t in ins]
    for t in ins + outs:
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    for t, v in zip(ins, [1, 9, 14]):
        pw.set_target(t, v)
    return data, data.prove(pw)


def test_recursive_lookup_circuit_builds():
    """Fast structural check: the outer verifier circuit for a lookup inner
    builds without tripping any no-lookup guard (delta challenges, lookup_zs
    targets, in-circuit LUT polynomial all wired)."""
    seed_randomness(600)
    config = CircuitConfig.standard_recursion_config_gl()
    inner = CircuitBuilder(config)
    lut = inner.add_lookup_table_from_table(list(range(16)), TIP5_16)
    t = inner.add_virtual_target()
    out = inner.add_lookup_from_index(t, lut)
    inner.register_public_input(t)
    inner.register_public_input(out)
    inner_data = inner.build()
    assert inner_data.common.num_lookup_polys > 0

    outer = CircuitBuilder(config)
    proof_t = rv.add_virtual_proof_with_pis(outer, inner_data.common)
    vk_t = rv.add_virtual_verifier_data(
        outer, inner_data.common.config.fri_config.cap_height)
    rv.verify_proof(outer, proof_t, vk_t, inner_data.common)
    assert len(proof_t.proof.openings.lookup_zs) == \
        inner_data.common.num_all_lookup_polys()
    outer_data = outer.build()
    assert outer_data.common.degree_bits >= 12


@pytest.mark.slow
def test_recursive_lookup_e2e():
    seed_randomness(601)
    inner_data, inner_proof = build_lookup_inner()
    verify(inner_proof, inner_data.verifier_only, inner_data.common)

    config = CircuitConfig.standard_recursion_config_gl()
    outer = CircuitBuilder(config)
    proof_t = rv.add_virtual_proof_with_pis(outer, inner_data.common)
    vk_t = rv.add_virtual_verifier_data(
        outer, inner_data.common.config.fri_config.cap_height)
    rv.verify_proof(outer, proof_t, vk_t, inner_data.common)
    outer.register_public_inputs(proof_t.public_inputs)

    outer_data = outer.build()
    pw = PartialWitness()
    rv.set_proof_with_pis_target(pw, proof_t, inner_proof)
    rv.set_verifier_data_target(pw, vk_t, inner_data.verifier_only)
    outer_proof = outer_data.prove(pw)
    assert outer_proof.public_inputs == inner_proof.public_inputs
    verify(outer_proof, outer_data.verifier_only, outer_data.common)
