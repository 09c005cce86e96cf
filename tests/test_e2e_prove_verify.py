"""End-to-end prove + verify over Goldilocks (milestone: SURVEY.md §7 step 6).

Mirrors the reference's fibonacci example (plonky2/examples/fibonacci.rs)
minus public inputs (those need the Poseidon gate, next milestone): the
result is pinned with a copy constraint to a constant instead.
"""

import pytest

from plonky2_goldibear_tpu.field import host
from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import (VerificationError, verify)
from plonky2_goldibear_tpu.fri.verifier import FriVerificationError


def fib_value(n, p):
    a, b = 0, 1
    for _ in range(n):
        a, b = b, (a + b) % p
    return a


@pytest.fixture(scope="module")
def fib_proof():
    seed_randomness(1234)
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    p = builder.spec.p

    initial_a = builder.add_virtual_target()
    initial_b = builder.add_virtual_target()
    a, b = initial_a, initial_b
    for _ in range(100):
        a, b = b, builder.add(a, b)
    expected = builder.constant(fib_value(100, p))
    builder.connect(a, expected)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial_a, 0)
    pw.set_target(initial_b, 1)
    proof = data.prove(pw)
    return data, proof


def test_prove_verify_roundtrip(fib_proof):
    data, proof = fib_proof
    verify(proof, data.verifier_only, data.common)


def test_tampered_opening_rejected(fib_proof):
    import copy
    data, proof = fib_proof
    bad = copy.deepcopy(proof)
    w = list(bad.proof.openings.wires[0])
    w[0] = (w[0] + 1) % data.common.spec.p
    bad.proof.openings.wires[0] = tuple(w)
    with pytest.raises((VerificationError, FriVerificationError,
                        AssertionError)):
        verify(bad, data.verifier_only, data.common)


def test_tampered_cap_rejected(fib_proof):
    import copy
    data, proof = fib_proof
    bad = copy.deepcopy(proof)
    bad.proof.wires_cap[0] = list(bad.proof.wires_cap[0])
    bad.proof.wires_cap[0][0] = (bad.proof.wires_cap[0][0] + 1) % \
        data.common.spec.p
    with pytest.raises((VerificationError, FriVerificationError,
                        AssertionError)):
        verify(bad, data.verifier_only, data.common)


def test_malformed_shape_rejected(fib_proof):
    """validate_shape: structurally-mangled proofs die with a clean
    VerificationError, not an internal IndexError (reference
    plonk/validate_shape.rs:10-72)."""
    import copy
    data, proof = fib_proof

    bad = copy.deepcopy(proof)
    bad.proof.openings.wires.pop()
    with pytest.raises(VerificationError, match="wire openings"):
        verify(bad, data.verifier_only, data.common)

    bad = copy.deepcopy(proof)
    bad.proof.wires_cap.pop()
    with pytest.raises(VerificationError, match="cap length"):
        verify(bad, data.verifier_only, data.common)

    bad = copy.deepcopy(proof)
    bad.proof.opening_proof.query_round_proofs.pop()
    with pytest.raises(VerificationError, match="query round count"):
        verify(bad, data.verifier_only, data.common)

    bad = copy.deepcopy(proof)
    bad.proof.opening_proof.final_poly.append(
        bad.proof.opening_proof.final_poly[0])
    with pytest.raises(VerificationError, match="final poly"):
        verify(bad, data.verifier_only, data.common)

    bad = copy.deepcopy(proof)
    if bad.proof.opening_proof.query_round_proofs[0].steps:
        del bad.proof.opening_proof.query_round_proofs[0].steps[0].evals[0]
        with pytest.raises(VerificationError, match="step evals"):
            verify(bad, data.verifier_only, data.common)
    else:
        # no fold rounds at this circuit size: tamper the initial-tree
        # evals instead (same validate-shape family)
        itp = bad.proof.opening_proof.query_round_proofs[0]
        itp.initial_trees_proof.evals_proofs[0][0].pop()
        with pytest.raises(VerificationError, match="evals"):
            verify(bad, data.verifier_only, data.common)
