"""BabyBear recursive verification: a BB outer circuit verifies a BB inner
proof (reference recursive_verifier.rs:317 test_recursive_verifier_bb and
the deeper-tower variants).  Quartic extension, Poseidon2 width-16 hashing,
narrow recursion config."""

import pytest

from plonky2_goldibear_tpu.field import bb
from plonky2_goldibear_tpu.field.host import BABYBEAR
from plonky2_goldibear_tpu.hash import poseidon2_bb
from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify
from plonky2_goldibear_tpu.recursion import recursive_verifier as rv


def build_inner_bb():
    config = CircuitConfig.standard_recursion_config_bb()
    builder = CircuitBuilder(config, spec=BABYBEAR, F=bb,
                             hasher=poseidon2_bb)
    ia = builder.add_virtual_target()
    ib = builder.add_virtual_target()
    builder.register_public_input(ia)
    builder.register_public_input(ib)
    a, b_t = ia, ib
    for _ in range(40):
        a, b_t = b_t, builder.add(a, b_t)
    builder.register_public_input(a)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(ia, 1)
    pw.set_target(ib, 2)
    return data, data.prove(pw)


@pytest.mark.slow
def test_recursive_verification_babybear():
    seed_randomness(31415)
    inner_data, inner_proof = build_inner_bb()
    verify(inner_proof, inner_data.verifier_only, inner_data.common)

    config = CircuitConfig.standard_recursion_config_bb()
    outer = CircuitBuilder(config, spec=BABYBEAR, F=bb,
                           hasher=poseidon2_bb)
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
