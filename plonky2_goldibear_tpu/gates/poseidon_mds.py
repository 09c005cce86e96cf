"""PoseidonMdsGate: one width-12 MDS layer over extension elements
(reference plonky2/src/gates/poseidon_goldilocks_mds.rs).  MDS coefficients
are base constants, so the layer acts componentwise on each extension
coordinate.
"""

from __future__ import annotations

from typing import List

from ..hash import _poseidon_gl_constants as C
from ..iop import generator as gen
from ..iop import target as tgt
from .base import EvaluationVars, Gate

W = C.SPONGE_WIDTH


class PoseidonMdsGate(Gate):
    def __init__(self, D: int = 2):
        self.D = D

    def id(self):
        return f"PoseidonMdsGate(PhantomData<plonky2_field::goldilocks_" \
            f"field::GoldilocksField>)<WIDTH={W}>"

    def wires_input(self, i):
        return range(i * self.D, (i + 1) * self.D)

    def wires_output(self, i):
        return range((W + i) * self.D, (W + i + 1) * self.D)

    def num_wires(self):
        return 2 * self.D * W

    def num_constants(self):
        return 0

    def degree(self):
        return 1

    def num_constraints(self):
        return W * self.D

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        lw = vars.local_wires
        inputs = [[lw[w] for w in self.wires_input(i)] for i in range(W)]
        out = []
        for r in range(W):
            computed = [None] * self.D
            for d in range(self.D):
                acc = None
                for i in range(W):
                    t = A.mul_base_const(inputs[(i + r) % W][d],
                                         C.MDS_MATRIX_CIRC[i])
                    acc = t if acc is None else A.add(acc, t)
                acc = A.add(acc, A.mul_base_const(inputs[r][d],
                                                  C.MDS_MATRIX_DIAG[r]))
                computed[d] = acc
            outw = list(self.wires_output(r))
            for d in range(self.D):
                out.append(A.sub(lw[outw[d]], computed[d]))
        return out

    def generators(self, row, local_constants, spec):
        return [_MdsGenerator(self, row, spec)]


class _MdsGenerator(gen.SimpleGenerator):
    def __init__(self, gate, row, spec):
        self.gate, self.row, self.spec = gate, row, spec

    def dependencies(self):
        g = self.gate
        return [tgt.wire(self.row, w) for i in range(W)
                for w in g.wires_input(i)]

    def run_once(self, witness, out):
        g = self.gate
        p = self.spec.p
        inputs = [[witness.get_target(tgt.wire(self.row, w))
                   for w in g.wires_input(i)] for i in range(W)]
        for r in range(W):
            for d, w in enumerate(g.wires_output(r)):
                acc = 0
                for i in range(W):
                    acc += C.MDS_MATRIX_CIRC[i] * inputs[(i + r) % W][d]
                acc += C.MDS_MATRIX_DIAG[r] * inputs[r][d]
                out.append((tgt.wire(self.row, w), acc % p))
