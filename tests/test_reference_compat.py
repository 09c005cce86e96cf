"""Bit-compatibility with the reference Rust implementation: deserialize its
committed GL recursive-verifier regression artifacts (CommonCircuitData,
VerifierOnlyCircuitData, 149 kB proof — reference
plonky2/src/recursion/regression_test_data.rs, verified by its
test_recursive_verifier_gl_regression incl. under wasm) and verify the
proof with OUR native verifier.

This transitively pins: the Poseidon permutation, hash_or_noop/two_to_one,
the duplex-sponge challenger, selector/filter semantics (incl.
UNUSED_SELECTOR), the constraint systems of all 12 gates used by the
recursive verifier, partial products, and the complete FRI verifier
(combine, PoW, fold interpolation, index handling).
"""

import copy

import pytest

from plonky2_goldibear_tpu.plonk import serialization as ser
from plonky2_goldibear_tpu.plonk.verifier import verify


def _load():
    common = ser.read_common_circuit_data(
        open("tests/data/gl_regression_common.bin", "rb").read())
    vk = ser.read_verifier_only_circuit_data(
        open("tests/data/gl_regression_verifier.bin", "rb").read())
    proof = ser.read_proof_with_public_inputs(
        open("tests/data/gl_regression_proof.bin", "rb").read(), common)
    return common, vk, proof


def test_reference_circuit_shape():
    common, vk, proof = _load()
    assert common.degree_bits == 14
    assert common.num_gate_constraints == 123
    assert len(common.gates) == 12
    assert len(vk.constants_sigmas_cap) == 16
    assert proof.public_inputs == []


def test_reference_proof_verifies():
    common, vk, proof = _load()
    verify(proof, vk, common)


@pytest.mark.slow
def test_reference_circuit_rebuild_common_bytes_identical():
    """Producer direction: rebuild the reference's regression circuit with
    OUR builder — inner = dummy_proof(standard_recursion_zk_config_gl, 4000)
    (reference recursive_verifier.rs:666-697), outer = the recursive-verifier
    circuit over it (reference recursive_verifier.rs:895-955) — and require
    the serialized CommonCircuitData to be byte-identical to the committed
    reference artifact.  This pins the whole builder pipeline: gate set and
    parameters, selector grouping, zk blinding counts, degree, fri params,
    k_is, and the gadget structure of the in-circuit verifier (gate TYPES it
    allocates).  The verifier-key (cap/digest) direction — exact row
    placement and copy-constraint routing — is tracked separately in
    scripts/compare_regression_build.py."""
    from plonky2_goldibear_tpu.gates.basic_gates import NoopGate
    from plonky2_goldibear_tpu.gates.poseidon import PoseidonGate
    from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
    from plonky2_goldibear_tpu.plonk.config import CircuitConfig
    from plonky2_goldibear_tpu.recursion import recursive_verifier as rv

    config = CircuitConfig.standard_recursion_zk_config_gl()
    b = CircuitBuilder(config)
    for _ in range(4000):
        b.add_gate(NoopGate(), [])
    b.add_gate_to_gate_set(PoseidonGate())
    z = b.zero()
    for _ in range(b.spec.num_hash_out_elts):
        b.register_public_input(z)
    inner = b.build()

    b2 = CircuitBuilder(config)
    pt = rv.add_virtual_proof_with_pis(b2, inner.common)
    vk_t = rv.add_virtual_verifier_data(b2, config.fri_config.cap_height)
    rv.verify_proof(b2, pt, vk_t, inner.common)
    outer = b2.build()

    ref = open("tests/data/gl_regression_common.bin", "rb").read()
    ours = ser.write_common_circuit_data(outer.common)
    assert ours == ref


def test_tampered_reference_proof_rejected():
    common, vk, proof = _load()
    bad = copy.deepcopy(proof)
    w = list(bad.proof.openings.wires[7])
    w[1] = (w[1] + 1) % common.spec.p
    bad.proof.openings.wires[7] = tuple(w)
    with pytest.raises(Exception):
        verify(bad, vk, common)
