"""Reducing gates: Horner folds ``acc' = acc*alpha + c_i`` over base/ext
coefficient vectors (reference plonky2/src/gates/{reducing.rs,
reducing_extension.rs}) — the workhorse of ReducingFactorTarget in the
in-circuit FRI verifier.
"""

from __future__ import annotations

from typing import List

from ..field import host
from ..iop import generator as gen
from ..iop import target as tgt
from .base import (EvaluationVars, Gate, ext_algebra_add, ext_algebra_mul,
                   ext_algebra_sub)


class ReducingGate(Gate):
    """sum alpha^i c_i for base-field coefficients."""

    def __init__(self, num_coeffs: int, D: int):
        self.num_coeffs = num_coeffs
        self.D = D

    @classmethod
    def max_coeffs_len(cls, num_wires, num_routed_wires, D):
        return min(num_routed_wires - 3 * D, (num_wires - 2 * D) // (D + 1))

    def id(self):
        return f"ReducingGate {{ num_coeffs: {self.num_coeffs} }}"

    def wires_output(self):
        return range(0, self.D)

    def wires_alpha(self):
        return range(self.D, 2 * self.D)

    def wires_old_acc(self):
        return range(2 * self.D, 3 * self.D)

    def wires_coeffs(self):
        return range(3 * self.D, 3 * self.D + self.num_coeffs)

    def _start_accs(self):
        return 3 * self.D + self.num_coeffs

    def wires_accs(self, i):
        if i == self.num_coeffs - 1:
            return self.wires_output()
        return range(self._start_accs() + self.D * i,
                     self._start_accs() + self.D * (i + 1))

    def num_wires(self):
        return self._start_accs() + self.D * (self.num_coeffs - 1)

    def num_constants(self):
        return 0

    def degree(self):
        return 2

    def num_constraints(self):
        return self.D * self.num_coeffs

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        lw = vars.local_wires
        alpha = [lw[w] for w in self.wires_alpha()]
        acc = [lw[w] for w in self.wires_old_acc()]
        coeffs = [lw[w] for w in self.wires_coeffs()]
        out = []
        for i in range(self.num_coeffs):
            acc_i = [lw[w] for w in self.wires_accs(i)]
            term = ext_algebra_mul(A, A.spec, acc, alpha)
            term[0] = A.add(term[0], coeffs[i])
            out.extend(ext_algebra_sub(A, term, acc_i))
            acc = acc_i
        return out

    def generators(self, row, local_constants, spec):
        return [_ReducingGenerator(self, row, spec, ext_coeffs=False)]


class ReducingExtensionGate(Gate):
    """sum alpha^i c_i for extension coefficients."""

    def __init__(self, num_coeffs: int, D: int):
        self.num_coeffs = num_coeffs
        self.D = D

    @classmethod
    def max_coeffs_len(cls, num_wires, num_routed_wires, D):
        return min((num_routed_wires - 3 * D) // D,
                   (num_wires - 2 * D) // (2 * D))

    def id(self):
        return f"ReducingExtensionGate {{ num_coeffs: {self.num_coeffs} }}"

    def wires_output(self):
        return range(0, self.D)

    def wires_alpha(self):
        return range(self.D, 2 * self.D)

    def wires_old_acc(self):
        return range(2 * self.D, 3 * self.D)

    def wires_coeff(self, i):
        return range(3 * self.D + i * self.D, 3 * self.D + (i + 1) * self.D)

    def _start_accs(self):
        return 3 * self.D + self.num_coeffs * self.D

    def wires_accs(self, i):
        if i == self.num_coeffs - 1:
            return self.wires_output()
        return range(self._start_accs() + self.D * i,
                     self._start_accs() + self.D * (i + 1))

    def num_wires(self):
        return self._start_accs() + self.D * (self.num_coeffs - 1)

    def num_constants(self):
        return 0

    def degree(self):
        return 2

    def num_constraints(self):
        return self.D * self.num_coeffs

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        lw = vars.local_wires
        alpha = [lw[w] for w in self.wires_alpha()]
        acc = [lw[w] for w in self.wires_old_acc()]
        out = []
        for i in range(self.num_coeffs):
            coeff = [lw[w] for w in self.wires_coeff(i)]
            acc_i = [lw[w] for w in self.wires_accs(i)]
            term = ext_algebra_mul(A, A.spec, acc, alpha)
            term = ext_algebra_add(A, term, coeff)
            out.extend(ext_algebra_sub(A, term, acc_i))
            acc = acc_i
        return out

    def generators(self, row, local_constants, spec):
        return [_ReducingGenerator(self, row, spec, ext_coeffs=True)]


class _ReducingGenerator(gen.SimpleGenerator):
    def __init__(self, gate, row, spec, ext_coeffs: bool):
        self.gate, self.row, self.spec = gate, row, spec
        self.ext_coeffs = ext_coeffs

    def _coeff_wires(self):
        g = self.gate
        if self.ext_coeffs:
            return [list(g.wires_coeff(i)) for i in range(g.num_coeffs)]
        return [[w] for w in g.wires_coeffs()]

    def dependencies(self):
        g = self.gate
        deps = [tgt.wire(self.row, w) for w in g.wires_alpha()]
        deps += [tgt.wire(self.row, w) for w in g.wires_old_acc()]
        for ws in self._coeff_wires():
            deps += [tgt.wire(self.row, w) for w in ws]
        return deps

    def run_once(self, witness, out):
        g = self.gate
        spec = self.spec
        get = lambda w: witness.get_target(tgt.wire(self.row, w))  # noqa
        alpha = tuple(get(w) for w in g.wires_alpha())
        acc = tuple(get(w) for w in g.wires_old_acc())
        for i, ws in enumerate(self._coeff_wires()):
            c = tuple(get(w) for w in ws)
            if len(c) == 1:
                c = host.ext_from_base(spec, c[0])
            acc = host.ext_add(spec, host.ext_mul(spec, acc, alpha), c)
            for w, v in zip(g.wires_accs(i), acc):
                out.append((tgt.wire(self.row, w), v))
