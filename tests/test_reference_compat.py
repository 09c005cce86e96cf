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


def test_tampered_reference_proof_rejected():
    common, vk, proof = _load()
    bad = copy.deepcopy(proof)
    w = list(bad.proof.openings.wires[7])
    w[1] = (w[1] + 1) % common.spec.p
    bad.proof.openings.wires[7] = tuple(w)
    with pytest.raises(Exception):
        verify(bad, vk, common)
