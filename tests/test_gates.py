"""Per-gate harness runs (reference: each gate file instantiates
test_low_degree + test_eval_fns, e.g. gates/arithmetic_base.rs tests)."""

import pytest

from plonky2_goldibear_tpu.field.host import GOLDILOCKS
from plonky2_goldibear_tpu.gates import gate_testing as gt
from plonky2_goldibear_tpu.gates.basic_gates import (ArithmeticGate,
                                                     ConstantGate,
                                                     PublicInputGate)
from plonky2_goldibear_tpu.gates.extension_gates import (
    ArithmeticExtensionGate, MulExtensionGate)
from plonky2_goldibear_tpu.gates.poseidon import PoseidonGate

GATES = [
    ArithmeticGate(num_ops=20),
    ArithmeticExtensionGate(num_ops=10, D=2),
    MulExtensionGate(num_ops=13, D=2),
    ConstantGate(num_consts=2),
    PublicInputGate(4),
]


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id())
def test_low_degree(gate):
    gt.test_low_degree(gate, GOLDILOCKS)


def test_low_degree_poseidon():
    gt.test_low_degree(PoseidonGate(), GOLDILOCKS)


@pytest.mark.parametrize("gate", [
    ArithmeticGate(num_ops=20),
    ArithmeticExtensionGate(num_ops=10, D=2),
    MulExtensionGate(num_ops=13, D=2),
], ids=lambda g: g.id())
def test_generated_witness_satisfies_constraints(gate):
    gt.check_generated_witness(gate, GOLDILOCKS)


def test_generated_witness_poseidon():
    gt.check_generated_witness(
        PoseidonGate(), GOLDILOCKS,
        fixed={("w", 0, PoseidonGate.WIRE_SWAP): 0})


def test_access_gates_low_degree_and_witness():
    from plonky2_goldibear_tpu.gates.access_gates import (
        RandomAccessGate, BaseSumGate, ExponentiationGate)
    for gate, fixed, consts in [
        # access indices < 4; wire 12 is the extra-constant stash, which the
        # builder (not the gate generator) fills — pin it to the constant
        (RandomAccessGate(bits=2, num_copies=2, num_extra_constants=1),
         {("w", 0, 0): 2, ("w", 0, 6): 1, ("w", 0, 12): 7}, [7]),
        (BaseSumGate(num_limbs=8, base=2), {("w", 0, 0): 0xA5}, None),
        (ExponentiationGate(num_power_bits=5),
         {("w", 0, 1 + i): (0b10110 >> i) & 1 for i in range(5)}, None),
    ]:
        gt.test_low_degree(gate, GOLDILOCKS)
        gt.check_generated_witness(gate, GOLDILOCKS, fixed=fixed,
                                   constants=consts)
