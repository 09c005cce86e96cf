"""Extension-field arithmetic gates
(reference plonky2/src/gates/{arithmetic_extension.rs,
multiplication_extension.rs}).

Constraints are in the extension *algebra* F_D[X]/(X^D - W) over the
evaluation field: each op's wires hold D base-field coefficients per
operand, and one op emits D constraints.
"""

from __future__ import annotations

from typing import List

from ..field import host
from ..iop import generator as gen
from ..iop import target as tgt
from .base import (EvaluationVars, Gate, ext_algebra_add, ext_algebra_mul,
                   ext_algebra_scalar_mul, ext_algebra_sub)


class ArithmeticExtensionGate(Gate):
    """output = const_0 * m0 * m1 + const_1 * addend over the extension
    (reference arithmetic_extension.rs:27-110); op i uses wires
    [4D*i, 4D*(i+1))."""

    def __init__(self, num_ops: int, D: int):
        self.num_ops = num_ops
        self.D = D

    @classmethod
    def from_config(cls, config, D: int):
        return cls(config.num_routed_wires // (4 * D), D)

    def id(self):
        return f"ArithmeticExtensionGate {{ num_ops: {self.num_ops} }}"

    def wires_op(self, i: int):
        D = self.D
        base = 4 * D * i
        return (range(base, base + D), range(base + D, base + 2 * D),
                range(base + 2 * D, base + 3 * D),
                range(base + 3 * D, base + 4 * D))

    def num_wires(self):
        return 4 * self.D * self.num_ops

    def num_constants(self):
        return 2

    def degree(self):
        return 3

    def num_constraints(self):
        return self.num_ops * self.D

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        c0 = vars.local_constants[0]
        c1 = vars.local_constants[1]
        out = []
        for i in range(self.num_ops):
            m0r, m1r, adr, outr = self.wires_op(i)
            m0 = [vars.local_wires[w] for w in m0r]
            m1 = [vars.local_wires[w] for w in m1r]
            ad = [vars.local_wires[w] for w in adr]
            o = [vars.local_wires[w] for w in outr]
            prod = ext_algebra_mul(A, A.spec, m0, m1)
            computed = ext_algebra_add(
                A, ext_algebra_scalar_mul(A, prod, c0),
                ext_algebra_scalar_mul(A, ad, c1))
            out.extend(ext_algebra_sub(A, o, computed))
        return out

    def generators(self, row, local_constants, spec):
        c0, c1 = int(local_constants[0]), int(local_constants[1])
        return [_ArithmeticExtOpGenerator(self, row, c0, c1, i, spec)
                for i in range(self.num_ops)]


class _ArithmeticExtOpGenerator(gen.SimpleGenerator):
    def __init__(self, gate, row, c0, c1, i, spec):
        self.gate, self.row, self.c0, self.c1, self.i, self.spec = \
            gate, row, c0, c1, i, spec

    def dependencies(self):
        m0r, m1r, adr, _ = self.gate.wires_op(self.i)
        return [tgt.wire(self.row, w) for r in (m0r, m1r, adr) for w in r]

    def run_once(self, witness, out):
        spec = self.spec
        m0r, m1r, adr, outr = self.gate.wires_op(self.i)
        m0 = tuple(witness.get_target(tgt.wire(self.row, w)) for w in m0r)
        m1 = tuple(witness.get_target(tgt.wire(self.row, w)) for w in m1r)
        ad = tuple(witness.get_target(tgt.wire(self.row, w)) for w in adr)
        res = host.ext_add(
            spec,
            host.ext_scalar_mul(spec, host.ext_mul(spec, m0, m1), self.c0),
            host.ext_scalar_mul(spec, ad, self.c1))
        for w, v in zip(outr, res):
            out.append((tgt.wire(self.row, w), v))


class MulExtensionGate(Gate):
    """output = const_0 * m0 * m1 over the extension
    (reference multiplication_extension.rs:27-95); op i uses wires
    [3D*i, 3D*(i+1))."""

    def __init__(self, num_ops: int, D: int):
        self.num_ops = num_ops
        self.D = D

    @classmethod
    def from_config(cls, config, D: int):
        return cls(config.num_routed_wires // (3 * D), D)

    def id(self):
        return f"MulExtensionGate {{ num_ops: {self.num_ops} }}"

    def wires_op(self, i: int):
        D = self.D
        base = 3 * D * i
        return (range(base, base + D), range(base + D, base + 2 * D),
                range(base + 2 * D, base + 3 * D))

    def num_wires(self):
        return 3 * self.D * self.num_ops

    def num_constants(self):
        return 1

    def degree(self):
        return 3

    def num_constraints(self):
        return self.num_ops * self.D

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        c0 = vars.local_constants[0]
        out = []
        for i in range(self.num_ops):
            m0r, m1r, outr = self.wires_op(i)
            m0 = [vars.local_wires[w] for w in m0r]
            m1 = [vars.local_wires[w] for w in m1r]
            o = [vars.local_wires[w] for w in outr]
            prod = ext_algebra_mul(A, A.spec, m0, m1)
            computed = ext_algebra_scalar_mul(A, prod, c0)
            out.extend(ext_algebra_sub(A, o, computed))
        return out

    def generators(self, row, local_constants, spec):
        c0 = int(local_constants[0])
        return [_MulExtOpGenerator(self, row, c0, i, spec)
                for i in range(self.num_ops)]


class _MulExtOpGenerator(gen.SimpleGenerator):
    def __init__(self, gate, row, c0, i, spec):
        self.gate, self.row, self.c0, self.i, self.spec = \
            gate, row, c0, i, spec

    def dependencies(self):
        m0r, m1r, _ = self.gate.wires_op(self.i)
        return [tgt.wire(self.row, w) for r in (m0r, m1r) for w in r]

    def run_once(self, witness, out):
        spec = self.spec
        m0r, m1r, outr = self.gate.wires_op(self.i)
        m0 = tuple(witness.get_target(tgt.wire(self.row, w)) for w in m0r)
        m1 = tuple(witness.get_target(tgt.wire(self.row, w)) for w in m1r)
        res = host.ext_scalar_mul(spec, host.ext_mul(spec, m0, m1), self.c0)
        for w, v in zip(outr, res):
            out.append((tgt.wire(self.row, w), v))
