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


def test_poseidon_device_eval_matches_generic():
    """The scan/matmul device evaluation must produce identical constraint
    values (and order) to the generic algebra evaluation."""
    import jax
    import numpy as np
    from plonky2_goldibear_tpu.field import gl
    from plonky2_goldibear_tpu.gates.base import (DeviceBaseAlgebra,
                                                  EvaluationVars)
    tree_map = jax.tree_util.tree_map
    g = PoseidonGate()
    rng = np.random.default_rng(0)
    m = 4
    wires = gl.from_ints(rng.integers(0, gl.P, size=(g.num_wires(), m),
                                      dtype=np.uint64))
    A = DeviceBaseAlgebra(gl, m)
    vars = EvaluationVars(
        [], [tree_map(lambda a, j=j: a[j], wires)
             for j in range(g.num_wires())], [A.from_int(0)] * 4)
    generic = g.eval_unfiltered(A, vars)
    dev = g.eval_unfiltered_device(gl, wires, vars)
    assert len(generic) == len(dev) == g.num_constraints()
    for a, b in zip(generic, dev):
        assert np.array_equal(gl.to_ints(a), gl.to_ints(b))


def test_reducing_and_interpolation_gates():
    from plonky2_goldibear_tpu.gates.reducing import (ReducingGate,
                                                      ReducingExtensionGate)
    from plonky2_goldibear_tpu.gates.coset_interpolation import \
        CosetInterpolationGate
    for gate in [ReducingGate(num_coeffs=10, D=2),
                 ReducingExtensionGate(num_coeffs=8, D=2),
                 CosetInterpolationGate(subgroup_bits=4, max_degree=6)]:
        gt.test_low_degree(gate, GOLDILOCKS)

    gt.check_generated_witness(ReducingGate(num_coeffs=10, D=2), GOLDILOCKS)
    gt.check_generated_witness(ReducingExtensionGate(num_coeffs=8, D=2),
                               GOLDILOCKS)
    # interpolation: shift must be nonzero
    gt.check_generated_witness(
        CosetInterpolationGate(subgroup_bits=4, max_degree=6), GOLDILOCKS,
        fixed={("w", 0, 0): 7})


def test_coset_interpolation_gate_math():
    """The generated evaluation_value must equal a reference barycentric
    interpolation of the coset values at the evaluation point."""
    import random
    from plonky2_goldibear_tpu.field import host
    from plonky2_goldibear_tpu.fri.verifier import interpolate_ext
    from plonky2_goldibear_tpu.gates.coset_interpolation import \
        CosetInterpolationGate
    from plonky2_goldibear_tpu.gates.gate_testing import _DictWitness

    spec = GOLDILOCKS
    rng = random.Random(11)
    g = CosetInterpolationGate(subgroup_bits=4, max_degree=6)
    shift = spec.generator
    wires = {("w", 0, g.wire_shift()): shift}
    vals = []
    for i in range(g.num_points):
        v = host.ext_sample(spec, rng)
        vals.append(v)
        for w, c in zip(g.wires_value(i), v):
            wires[("w", 0, w)] = c
    zeta = host.ext_sample(spec, rng)
    for w, c in zip(g.wires_evaluation_point(), zeta):
        wires[("w", 0, w)] = c
    w_ = _DictWitness(wires)
    out = []
    g.generators(0, [], spec)[0].run_once(w_, out)
    got = dict(out)
    eval_value = tuple(got[("w", 0, w)] for w in g.wires_evaluation_value())
    # reference: interpolate over coset points shift * g^i at zeta
    pts = [shift * x % spec.p for x in g.domain]
    expected = interpolate_ext(spec, pts, vals, zeta)
    assert eval_value == tuple(expected)


def test_poseidon2_bb_gate():
    from plonky2_goldibear_tpu.field.host import BABYBEAR
    from plonky2_goldibear_tpu.gates.poseidon2_bb_gate import \
        Poseidon2BabyBearGate
    from plonky2_goldibear_tpu.hash import poseidon2_bb as p2
    g = Poseidon2BabyBearGate(num_ops=1)
    gt.test_low_degree(g, BABYBEAR)
    gt.check_generated_witness(g, BABYBEAR,
                               fixed={("w", 0, g.wire_swap(0)): 0})
    # outputs equal the reference permutation
    import random
    rng = random.Random(3)
    from plonky2_goldibear_tpu.gates.gate_testing import _DictWitness
    wires = {("w", 0, g.wire_swap(0)): 1}
    inp = [rng.randrange(BABYBEAR.p) for _ in range(16)]
    for i, v in enumerate(inp):
        wires[("w", 0, g.wire_input(0, i))] = v
    w = _DictWitness(wires)
    out = []
    g.generators(0, [], BABYBEAR)[0].run_once(w, out)
    got = dict(out)
    outputs = [got[("w", 0, g.wire_output(0, i))] for i in range(16)]
    swapped = list(inp)
    for i in range(8):
        swapped[i], swapped[i + 8] = swapped[i + 8], swapped[i]
    assert outputs == p2.permute_host(swapped)


def test_misc_bb_gates():
    from plonky2_goldibear_tpu.field.host import BABYBEAR
    from plonky2_goldibear_tpu.gates.misc_gates import (
        AddManyGate, ApplyMat4Gate, Poseidon2InternalPermutationGate)
    for gate in [AddManyGate(num_addends=5, num_ops=6),
                 ApplyMat4Gate(num_ops=1, D=4),
                 Poseidon2InternalPermutationGate(D=4)]:
        gt.test_low_degree(gate, BABYBEAR)
        gt.check_generated_witness(gate, BABYBEAR)
