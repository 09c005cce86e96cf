"""Zero-knowledge mode: blinding rows + salted oracles
(reference circuit_builder.rs:880-980, fri/oracle.rs:139-149)."""

import pytest

from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify


def test_zk_prove_verify():
    seed_randomness(31337)
    config = CircuitConfig.standard_recursion_zk_config_gl()
    builder = CircuitBuilder(config)
    ia = builder.add_virtual_target()
    ib = builder.add_virtual_target()
    builder.register_public_input(ia)
    builder.register_public_input(ib)
    a, b = ia, ib
    for _ in range(30):
        a, b = b, builder.add(a, b)
    builder.register_public_input(a)
    data = builder.build()
    assert data.common.fri_params.hiding

    pw = PartialWitness()
    pw.set_target(ia, 1)
    pw.set_target(ib, 2)
    proof = data.prove(pw)
    verify(proof, data.verifier_only, data.common)

    # proving the same statement twice yields different proofs (hiding)
    proof2 = data.prove(pw)
    assert proof2.proof.wires_cap != proof.proof.wires_cap
