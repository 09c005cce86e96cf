"""logUp lookup argument e2e (reference lookup_test.rs / the lookup tests in
recursive_verifier.rs:341-413)."""

import pytest

from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify

# first 16 entries of the Tip5 table (reference gadgets/lookup.rs TIP5_TABLE)
TIP5_16 = [0, 7, 26, 63, 124, 215, 85, 254, 214, 228, 45, 185, 140, 173,
           33, 240]


@pytest.fixture(scope="module")
def lookup_proof():
    seed_randomness(555)
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    lut_index = builder.add_lookup_table_from_table(
        list(range(16)), TIP5_16)

    inputs = [builder.add_virtual_target() for _ in range(3)]
    outputs = [builder.add_lookup_from_index(t, lut_index) for t in inputs]
    for t in inputs:
        builder.register_public_input(t)
    for t in outputs:
        builder.register_public_input(t)

    data = builder.build()
    pw = PartialWitness()
    for t, v in zip(inputs, [0, 5, 11]):
        pw.set_target(t, v)
    proof = data.prove(pw)
    return data, proof


def test_lookup_prove_verify(lookup_proof):
    data, proof = lookup_proof
    assert proof.public_inputs[3:] == [TIP5_16[0], TIP5_16[5], TIP5_16[11]]
    verify(proof, data.verifier_only, data.common)


def test_lookup_tampered_output_rejected(lookup_proof):
    import copy
    data, proof = lookup_proof
    bad = copy.deepcopy(proof)
    bad.public_inputs[4] = (bad.public_inputs[4] + 1) % data.common.spec.p
    with pytest.raises(Exception):
        verify(bad, data.verifier_only, data.common)
