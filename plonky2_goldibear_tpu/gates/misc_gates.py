"""AddManyGate, ApplyMat4Gate, Poseidon2InternalPermutationGate
(reference plonky2/src/gates/{add_many.rs, apply_mat4.rs,
poseidon2_internal_permutation.rs}) — helper gates used by the BabyBear
recursive verifier to shrink circuit size.
"""

from __future__ import annotations

from typing import List

from ..hash import _poseidon2_bb_constants as C
from ..hash import poseidon2_bb as p2
from ..iop import generator as gen
from ..iop import target as tgt
from .base import EvaluationVars, Gate

W = C.SPONGE_WIDTH


class AddManyGate(Gate):
    """Batched many-operand additions (reference add_many.rs:24-105);
    op i uses wires [(n+1)i, (n+1)(i+1))."""

    def __init__(self, num_addends: int, num_ops: int):
        self.num_addends = num_addends
        self.num_ops = num_ops

    @classmethod
    def from_config(cls, config, num_addends: int):
        return cls(num_addends,
                   config.num_routed_wires // (num_addends + 1))

    def id(self):
        return (f"AddManyGate {{ num_addends: {self.num_addends}, "
                f"num_ops: {self.num_ops} }}")

    def wires_addends(self, i):
        base = (self.num_addends + 1) * i
        return range(base, base + self.num_addends)

    def wire_sum(self, i):
        return (self.num_addends + 1) * i + self.num_addends

    def num_wires(self):
        return (self.num_addends + 1) * self.num_ops

    def num_constants(self):
        return 0

    def degree(self):
        return 1

    def num_constraints(self):
        return self.num_ops

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        out = []
        for i in range(self.num_ops):
            acc = A.zero()
            for w in self.wires_addends(i):
                acc = A.add(acc, vars.local_wires[w])
            out.append(A.sub(acc, vars.local_wires[self.wire_sum(i)]))
        return out

    def generators(self, row, local_constants, spec):
        return [_AddManyGenerator(self, row, i, spec.p)
                for i in range(self.num_ops)]


class _AddManyGenerator(gen.SimpleGenerator):
    def __init__(self, gate, row, i, p):
        self.gate, self.row, self.i, self.p = gate, row, i, p

    def dependencies(self):
        return [tgt.wire(self.row, w)
                for w in self.gate.wires_addends(self.i)]

    def run_once(self, witness, out):
        s = sum(witness.get_target(tgt.wire(self.row, w))
                for w in self.gate.wires_addends(self.i)) % self.p
        out.append((tgt.wire(self.row, self.gate.wire_sum(self.i)), s))


class ApplyMat4Gate(Gate):
    """4x4 external-matrix multiply over extension elements
    (reference apply_mat4.rs; the M4 block of the Poseidon2 external
    layer)."""

    def __init__(self, num_ops: int, D: int):
        self.num_ops = num_ops
        self.D = D

    @classmethod
    def from_config(cls, config, D: int):
        return cls(config.num_routed_wires // (8 * D), D)

    def id(self):
        return f"ApplyMat4Gate {{ num_ops: {self.num_ops}, _phantom: " \
            f"PhantomData<p3_baby_bear::baby_bear::BabyBear> }}<D={self.D}>"

    def wires_input(self, op, i):
        base = 8 * self.D * op + i * self.D
        return range(base, base + self.D)

    def wires_output(self, op, i):
        base = 8 * self.D * op + (4 + i) * self.D
        return range(base, base + self.D)

    def num_wires(self):
        return 8 * self.D * self.num_ops

    def num_constants(self):
        return 0

    def degree(self):
        return 1

    def num_constraints(self):
        return 4 * self.D * self.num_ops

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        out = []
        for op in range(self.num_ops):
            for d in range(self.D):
                x = [vars.local_wires[list(self.wires_input(op, i))[d]]
                     for i in range(4)]
                y = p2.apply_mat4_a(A, x)
                for i in range(4):
                    out.append(A.sub(
                        y[i],
                        vars.local_wires[list(self.wires_output(op, i))[d]]))
        return out

    def generators(self, row, local_constants, spec):
        return [_ApplyMat4Generator(self, row, op, spec)
                for op in range(self.num_ops)]


class _ApplyMat4Generator(gen.SimpleGenerator):
    def __init__(self, gate, row, op, spec):
        self.gate, self.row, self.op, self.spec = gate, row, op, spec

    def dependencies(self):
        return [tgt.wire(self.row, w) for i in range(4)
                for w in self.gate.wires_input(self.op, i)]

    def run_once(self, witness, out):
        from .base import HostBaseAlgebra
        A = HostBaseAlgebra(self.spec)
        g = self.gate
        for d in range(g.D):
            x = [witness.get_target(
                tgt.wire(self.row, list(g.wires_input(self.op, i))[d]))
                for i in range(4)]
            y = p2.apply_mat4_a(A, x)
            for i in range(4):
                out.append((tgt.wire(self.row,
                                     list(g.wires_output(self.op, i))[d]),
                            y[i]))


class Poseidon2InternalPermutationGate(Gate):
    """One width-16 Poseidon2 internal (diffusion) layer over extension
    elements (reference poseidon2_internal_permutation.rs)."""

    def __init__(self, D: int):
        self.D = D

    def id(self):
        return ("Poseidon2InternalPermutationGate {{ _phantom: PhantomData"
                f"<p3_baby_bear::baby_bear::BabyBear> }}<D={self.D}>")

    def wires_input(self, i):
        return range(i * self.D, (i + 1) * self.D)

    def wires_output(self, i):
        return range((W + i) * self.D, (W + i + 1) * self.D)

    def num_wires(self):
        return 2 * W * self.D

    def num_constants(self):
        return 0

    def degree(self):
        return 1

    def num_constraints(self):
        return W * self.D

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        out = []
        for d in range(self.D):
            state = [vars.local_wires[list(self.wires_input(i))[d]]
                     for i in range(W)]
            y = p2.internal_layer_a(A, state)
            for i in range(W):
                out.append(A.sub(
                    y[i], vars.local_wires[list(self.wires_output(i))[d]]))
        return out

    def generators(self, row, local_constants, spec):
        return [_InternalPermGenerator(self, row, spec)]


class _InternalPermGenerator(gen.SimpleGenerator):
    def __init__(self, gate, row, spec):
        self.gate, self.row, self.spec = gate, row, spec

    def dependencies(self):
        return [tgt.wire(self.row, w) for i in range(W)
                for w in self.gate.wires_input(i)]

    def run_once(self, witness, out):
        from .base import HostBaseAlgebra
        A = HostBaseAlgebra(self.spec)
        g = self.gate
        for d in range(g.D):
            state = [witness.get_target(
                tgt.wire(self.row, list(g.wires_input(i))[d]))
                for i in range(W)]
            y = p2.internal_layer_a(A, state)
            for i in range(W):
                out.append((tgt.wire(self.row,
                                     list(g.wires_output(i))[d]), y[i]))
