"""Zero-knowledge mode: blinding rows + salted oracles
(reference circuit_builder.rs:880-980, fri/oracle.rs:139-149).

The standard zk config's 28 FRI query rounds force ~8.3k blinding rows and
hence a 2^14 minimum degree; proving that on a single CPU core takes tens
of minutes of quotient execution, so the full-size test is @slow and the
default suite exercises the identical code paths (salted oracles, blinding
rows, z-pair copy constraints, hiding FRI) with a reduced-query config that
keeps the circuit at 2^11.
"""

from dataclasses import replace

import pytest

from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify


def _prove_verify_zk(config):
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


def test_zk_prove_verify_reduced_queries():
    """Same zk machinery at 6 query rounds -> ~1.8k blinding rows, 2^11."""
    seed_randomness(31337)
    config = CircuitConfig.standard_recursion_zk_config_gl()
    config = replace(config,
                     fri_config=replace(config.fri_config,
                                        num_query_rounds=6))
    _prove_verify_zk(config)


@pytest.mark.slow
def test_zk_prove_verify():
    """Full standard zk config (28 query rounds, 2^14 degree)."""
    seed_randomness(31337)
    _prove_verify_zk(CircuitConfig.standard_recursion_zk_config_gl())
