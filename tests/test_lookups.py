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


# full 256-entry Tip5 table (reference gadgets/lookup.rs:16 TIP5_TABLE)
TIP5_256 = [
    0, 7, 26, 63, 124, 215, 85, 254, 214, 228, 45, 185, 140, 173, 33, 240,
    29, 177, 176, 32, 8, 110, 87, 202, 204, 99, 150, 106, 230, 14, 235, 128,
    213, 239, 212, 138, 23, 130, 208, 6, 44, 71, 93, 116, 146, 189, 251, 81,
    199, 97, 38, 28, 73, 179, 95, 84, 152, 48, 35, 119, 49, 88, 242, 3,
    148, 169, 72, 120, 62, 161, 166, 83, 175, 191, 137, 19, 100, 129, 112,
    55, 221, 102, 218, 61, 151, 237, 68, 164, 17, 147, 46, 234, 203, 216,
    22, 141, 65, 57, 123, 12, 244, 54, 219, 231, 96, 77, 180, 154, 5, 253,
    133, 165, 98, 195, 205, 134, 245, 30, 9, 188, 59, 142, 186, 197, 181,
    144, 92, 31, 224, 163, 111, 74, 58, 69, 113, 196, 67, 246, 225, 10,
    121, 50, 60, 157, 90, 122, 2, 250, 101, 75, 178, 159, 24, 36, 201, 11,
    243, 132, 198, 190, 114, 233, 39, 52, 21, 209, 108, 238, 91, 187, 18,
    104, 194, 37, 153, 34, 200, 143, 126, 155, 236, 118, 64, 80, 172, 89,
    94, 193, 135, 183, 86, 107, 252, 13, 167, 206, 136, 220, 207, 103, 171,
    160, 76, 182, 227, 217, 158, 56, 174, 4, 66, 109, 139, 162, 184, 211,
    249, 47, 125, 232, 117, 43, 16, 42, 127, 20, 241, 25, 149, 105, 156,
    51, 53, 168, 145, 247, 223, 79, 78, 226, 15, 222, 82, 115, 70, 210,
    27, 41, 1, 170, 40, 131, 192, 229, 248, 255,
]


def test_same_luts_prove_verify():
    """Two identical tables registered separately both work (reference
    lookup_test.rs:365 test_same_luts)."""
    seed_randomness(559)
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    lut0 = builder.add_lookup_table_from_table(list(range(16)), TIP5_16)
    lut1 = builder.add_lookup_table_from_table(list(range(16)), TIP5_16)
    ia, ib = builder.add_virtual_target(), builder.add_virtual_target()
    out0 = builder.add_lookup_from_index(ia, lut0)
    out1 = builder.add_lookup_from_index(ib, lut1)
    for t in (out0, out1):
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(ia, 4)
    pw.set_target(ib, 9)
    proof = data.prove(pw)
    assert proof.public_inputs == [TIP5_16[4], TIP5_16[9]]
    verify(proof, data.verifier_only, data.common)


@pytest.mark.slow
def test_big_lut_prove_verify():
    """Table-sized LUT: all 256 Tip5 entries, lookups deep into the table
    (reference lookup_test.rs:420 test_big_lut; the reference uses a 2^16
    LUT — 256 keeps the circuit provable on a 1-core CI box while still
    spanning many LookupTableGate rows)."""
    seed_randomness(560)
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    lut = builder.add_lookup_table_from_table(list(range(256)), TIP5_256)
    ia, ib = builder.add_virtual_target(), builder.add_virtual_target()
    out_a = builder.add_lookup_from_index(ia, lut)
    out_b = builder.add_lookup_from_index(ib, lut)
    builder.register_public_input(out_a)
    builder.register_public_input(out_b)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(ia, 51)
    pw.set_target(ib, 2)
    proof = data.prove(pw)
    assert proof.public_inputs == [TIP5_256[51], TIP5_256[2]]
    verify(proof, data.verifier_only, data.common)


def test_lookup_polys_batched_matches_host(lookup_proof):
    """The device-scan compute_lookup_polys must be bit-identical to the
    scalar host reference (reference prover.rs:555-674 semantics)."""
    import numpy as np

    from plonky2_goldibear_tpu.iop.generator import generate_partial_witness
    from plonky2_goldibear_tpu.plonk import prover as prover_mod
    from plonky2_goldibear_tpu.plonk.witness_transfer import WitnessTransfer
    from plonky2_goldibear_tpu.field import gl

    data, _ = lookup_proof
    pw = PartialWitness()
    # rebuild a witness (public inputs 0,5,11 as in the fixture)
    for t, v in zip(data.prover_only.public_inputs[:3], [0, 5, 11]):
        pw.set_target(t, v)
    partition = generate_partial_witness(pw, data.prover_only, data.common)
    prover_mod.set_lookup_wires(data.prover_only, data.common, partition)
    wt = WitnessTransfer(gl, partition, data.prover_only, data.common,
                         dense=True)
    witness = wt.matrix
    deltas4 = [123456789, 987654321, 192837465, 1029384756]
    got = prover_mod.compute_lookup_polys_batched(
        data.common, data.prover_only, witness, deltas4)
    want = prover_mod.compute_lookup_polys_host(
        data.common, data.prover_only, witness, deltas4)
    for i, (g, w) in enumerate(zip(got, want)):
        assert np.array_equal(np.asarray(g, dtype=np.uint64),
                              np.asarray(w, dtype=np.uint64)), f"poly {i}"
