"""Cyclic (IVC) recursion: a circuit that verifies its own vk from the
public inputs — the repeated-hash counter test
(reference recursion/cyclic_recursion.rs:281-383)."""

import pytest

from plonky2_goldibear_tpu.hash import poseidon_gl
from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify
from plonky2_goldibear_tpu.recursion import conditional as cc
from plonky2_goldibear_tpu.recursion import recursive_verifier as rv


def test_common_data_for_recursion_builds():
    """Fast half: the fixed-point common data is self-consistent in shape."""
    seed_randomness(700)
    config = CircuitConfig.standard_recursion_config_gl()
    common = cc.common_data_for_recursion(config)
    assert common.degree_bits >= 12
    assert common.config == config


@pytest.mark.slow
def test_cyclic_counter_ivc():
    seed_randomness(701)
    config = CircuitConfig.standard_recursion_config_gl()
    b = CircuitBuilder(config)
    one = b.one()

    # repeated-hash circuit: PIs = initial_hash(4) ++ current_hash(4) ++
    # counter ++ vk (appended by add_verifier_data_public_inputs)
    initial_hash = [b.add_virtual_target() for _ in range(4)]
    b.register_public_inputs(initial_hash)
    current_hash_in = [b.add_virtual_target() for _ in range(4)]
    current_hash_out = b.hash_n_to_hash_no_pad(list(current_hash_in))
    b.register_public_inputs(current_hash_out)
    counter = b.add_virtual_target()
    b.register_public_input(counter)

    common = cc.common_data_for_recursion(config)
    vk_t = cc.add_verifier_data_public_inputs(b)
    common.num_public_inputs = len(b.public_inputs)

    condition = b.add_virtual_target()   # bool: is there an inner proof?
    b.assert_zero(b.mul(condition, b.sub(condition, one)))

    inner = rv.add_virtual_proof_with_pis(b, common)
    inner_pis = inner.public_inputs
    inner_initial = inner_pis[0:4]
    inner_latest = inner_pis[4:8]
    inner_counter = inner_pis[8]
    for t, u in zip(initial_hash, inner_initial):
        b.connect(t, u)
    actual_in = cc.select_vec(b, condition, inner_latest, initial_hash)
    for t, u in zip(current_hash_in, actual_in):
        b.connect(t, u)
    new_counter = b.mul_add(condition, inner_counter, condition)
    b.connect(counter, new_counter)

    cc.conditionally_verify_cyclic_proof_or_dummy(b, condition, inner,
                                                  common)
    data = b.build()
    assert data.common == common

    # base case: condition = 0, inner = base proof with vk in PIs
    init_vals = [0, 1, 2, 3]
    base = cc.cyclic_base_proof(
        common, data.verifier_only,
        {i: v for i, v in enumerate(init_vals)})
    pw = PartialWitness()
    pw.set_target(condition, 0)
    rv.set_proof_with_pis_target(pw, inner, base)
    rv.set_verifier_data_target(pw, vk_t, data.verifier_only)
    proof0 = data.prove(pw)
    cc.check_cyclic_proof_verifier_data(proof0, data.verifier_only, common)
    verify(proof0, data.verifier_only, data.common)
    assert proof0.public_inputs[8] == 0

    # step 1: condition = 1, inner = proof0
    pw = PartialWitness()
    pw.set_target(condition, 1)
    rv.set_proof_with_pis_target(pw, inner, proof0)
    rv.set_verifier_data_target(pw, vk_t, data.verifier_only)
    proof1 = data.prove(pw)
    cc.check_cyclic_proof_verifier_data(proof1, data.verifier_only, common)
    verify(proof1, data.verifier_only, data.common)
    assert proof1.public_inputs[8] == 1

    # step 2
    pw = PartialWitness()
    pw.set_target(condition, 1)
    rv.set_proof_with_pis_target(pw, inner, proof1)
    rv.set_verifier_data_target(pw, vk_t, data.verifier_only)
    proof2 = data.prove(pw)
    verify(proof2, data.verifier_only, data.common)
    assert proof2.public_inputs[8] == 2

    # the hash chain: each proof applies one hash, so latest == H^3(initial)
    h = list(init_vals)
    for _ in range(3):
        h = poseidon_gl.hash_no_pad_host(h)
    assert proof2.public_inputs[4:8] == h
