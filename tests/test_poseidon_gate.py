"""Poseidon gate: fast-schedule equivalence + prove/verify with public
inputs (exercises the in-circuit PI hash, reference
circuit_builder.rs:1129-1139 and gates/poseidon_goldilocks.rs)."""

import random

import pytest

from plonky2_goldibear_tpu.field.host import GOLDILOCKS
from plonky2_goldibear_tpu.gates.base import HostBaseAlgebra, EvaluationVars
from plonky2_goldibear_tpu.hash import _poseidon_gl_constants as C
from plonky2_goldibear_tpu.hash import poseidon_gl as pg
from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify


def test_fast_partial_path_matches_naive():
    A = HostBaseAlgebra(GOLDILOCKS)
    rng = random.Random(3)
    for _ in range(3):
        st = [rng.randrange(GOLDILOCKS.p) for _ in range(12)]
        assert pg.permute_fast_a(A, list(st)) == pg.permute_host(st)
    for inp, out in C.TEST_VECTORS:
        assert pg.permute_fast_a(A, list(inp)) == list(out)


def test_gate_constraints_vanish_on_generated_witness():
    """Native eval consistency: run the generator on random inputs and check
    every constraint evaluates to zero (the reference's test_eval_fns
    analogue, gates/gate_testing.rs:102)."""
    from plonky2_goldibear_tpu.gates.poseidon import (PoseidonGate,
                                                      PoseidonGenerator)

    class FakeWitness:
        def __init__(self):
            self.vals = {}

        def get_target(self, t):
            return self.vals[t]

    rng = random.Random(5)
    gate = PoseidonGate()
    w = FakeWitness()
    for i in range(12):
        w.vals[("w", 0, i)] = rng.randrange(GOLDILOCKS.p)
    w.vals[("w", 0, PoseidonGate.WIRE_SWAP)] = 1
    out = []
    PoseidonGenerator(0, GOLDILOCKS).run_once(w, out)
    wires = [0] * gate.num_wires()
    for i in range(12):
        wires[i] = w.vals[("w", 0, i)]
    wires[PoseidonGate.WIRE_SWAP] = 1
    for (kind, row, col), v in out:
        wires[col] = v
    A = HostBaseAlgebra(GOLDILOCKS)
    vars = EvaluationVars([], wires, [0] * 4)
    constraints = gate.eval_unfiltered(A, vars)
    assert len(constraints) == gate.num_constraints()
    assert all(c == 0 for c in constraints), \
        [i for i, c in enumerate(constraints) if c != 0][:5]
    # and the outputs equal the reference permutation of the swapped input
    swapped = list(wires[:12])
    for i in range(4):
        swapped[i], swapped[i + 4] = swapped[i + 4], swapped[i]
    expected = pg.permute_host(swapped)
    assert wires[12:24] == expected


@pytest.fixture(scope="module")
def pi_proof():
    seed_randomness(77)
    config = CircuitConfig.standard_recursion_config_gl()
    builder = CircuitBuilder(config)
    p = builder.spec.p

    ia = builder.add_virtual_target()
    ib = builder.add_virtual_target()
    builder.register_public_input(ia)
    builder.register_public_input(ib)
    a, b = ia, ib
    for _ in range(50):
        a, b = b, builder.add(a, b)
    builder.register_public_input(a)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(ia, 0)
    pw.set_target(ib, 1)
    proof = data.prove(pw)
    return data, proof


def test_prove_verify_with_public_inputs(pi_proof):
    data, proof = pi_proof
    aa, bb = 0, 1
    for _ in range(50):
        aa, bb = bb, (aa + bb) % data.common.spec.p
    assert proof.public_inputs == [0, 1, aa]
    verify(proof, data.verifier_only, data.common)


def test_wrong_public_inputs_rejected(pi_proof):
    import copy
    data, proof = pi_proof
    bad = copy.deepcopy(proof)
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % data.common.spec.p
    with pytest.raises(Exception):
        verify(bad, data.verifier_only, data.common)
