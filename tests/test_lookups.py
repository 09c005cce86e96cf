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


def test_unknown_lookup_table_panics():
    """reference lookup_test.rs:49-64 (no-table / wrong-index panics)."""
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    t = builder.add_virtual_target()
    with pytest.raises(AssertionError):
        builder.add_lookup_from_index(t, 0)


def test_unused_lookup_table_panics():
    """reference lookup_test.rs: a registered LUT with no lookups panics at
    build."""
    seed_randomness(556)
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    builder.add_lookup_table_from_table(list(range(16)), TIP5_16)
    a = builder.add_virtual_target()
    builder.register_public_input(a)
    with pytest.raises(AssertionError):
        builder.build()


def test_two_luts_prove_verify():
    """Two tables, interleaved lookups (reference lookup_test.rs two-LUT
    tests)."""
    seed_randomness(557)
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    lut0 = builder.add_lookup_table_from_table(list(range(16)), TIP5_16)
    other = [(x * 3 + 1) % 256 for x in range(16)]
    lut1 = builder.add_lookup_table_from_fn(
        lambda x: (x * 3 + 1) % 256, list(range(16)))

    ins = [builder.add_virtual_target() for _ in range(4)]
    outs = [builder.add_lookup_from_index(ins[0], lut0),
            builder.add_lookup_from_index(ins[1], lut1),
            builder.add_lookup_from_index(ins[2], lut0),
            builder.add_lookup_from_index(ins[3], lut1)]
    for t in ins:
        builder.register_public_input(t)
    for t in outs:
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    for t, v in zip(ins, [3, 7, 15, 0]):
        pw.set_target(t, v)
    proof = data.prove(pw)
    assert proof.public_inputs[4:] == [TIP5_16[3], other[7], TIP5_16[15],
                                       other[0]]
    verify(proof, data.verifier_only, data.common)


@pytest.mark.slow
def test_many_lookups_prove_verify():
    """515 lookups on one LUT (reference lookup_test.rs:many_lookups)."""
    seed_randomness(558)
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    lut = builder.add_lookup_table_from_table(list(range(16)), TIP5_16)
    ins = [builder.add_virtual_target() for _ in range(515)]
    outs = [builder.add_lookup_from_index(t, lut) for t in ins]
    builder.register_public_input(outs[0])
    builder.register_public_input(outs[514])
    data = builder.build()
    pw = PartialWitness()
    for i, t in enumerate(ins):
        pw.set_target(t, i % 16)
    proof = data.prove(pw)
    assert proof.public_inputs == [TIP5_16[0], TIP5_16[514 % 16]]
    verify(proof, data.verifier_only, data.common)
