"""Conditional recursion: verify a real proof or a generated dummy, selected
by a boolean (reference recursion/conditional_recursive_verifier.rs tests)."""

import pytest

from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk import gadgets as gd
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify
from plonky2_goldibear_tpu.recursion import conditional as cond
from plonky2_goldibear_tpu.recursion import recursive_verifier as rv
from tests.test_recursion import build_inner


@pytest.mark.slow
def test_conditionally_verify_proof_or_dummy():
    seed_randomness(99)
    inner_data, inner_proof = build_inner()

    config = CircuitConfig.standard_recursion_config_gl()
    outer = CircuitBuilder(config)
    condition = outer.add_virtual_target()
    gd.assert_bool(outer, condition)
    proof_t = rv.add_virtual_proof_with_pis(outer, inner_data.common)
    vk_t = rv.add_virtual_verifier_data(
        outer, inner_data.common.config.fri_config.cap_height)
    cond.conditionally_verify_proof_or_dummy(outer, condition, proof_t,
                                             vk_t, inner_data.common)
    outer_data = outer.build()

    # condition = 1: verify the real proof
    pw = PartialWitness()
    pw.set_target(condition, 1)
    rv.set_proof_with_pis_target(pw, proof_t, inner_proof)
    rv.set_verifier_data_target(pw, vk_t, inner_data.verifier_only)
    proof1 = outer_data.prove(pw)
    verify(proof1, outer_data.verifier_only, outer_data.common)

    # condition = 0: the dummy branch is taken; the real-proof targets still
    # need (arbitrary, here: real) witness values
    pw0 = PartialWitness()
    pw0.set_target(condition, 0)
    rv.set_proof_with_pis_target(pw0, proof_t, inner_proof)
    rv.set_verifier_data_target(pw0, vk_t, inner_data.verifier_only)
    proof0 = outer_data.prove(pw0)
    verify(proof0, outer_data.verifier_only, outer_data.common)
