"""CosetInterpolationGate: interpolate values on a coset of the 2^bits
subgroup and evaluate at an extension point — the FRI fold consistency
check in-circuit (reference plonky2/src/gates/coset_interpolation.rs).

The interpolation runs over the FIXED subgroup (barycentric weights baked
into the gate) with the coset shift folded into the evaluation point:
P(X) = P'(X * shift^-1).  Constraint degree is tunable: every (degree-1)'th
intermediate of the running (eval, prod) pair is stored in non-routed wires.
"""

from __future__ import annotations

from typing import List, Sequence

from ..field import host
from ..iop import generator as gen
from ..iop import target as tgt
from .base import (EvaluationVars, Gate, ext_algebra_add, ext_algebra_mul,
                   ext_algebra_scalar_mul, ext_algebra_sub)


def barycentric_weights_subgroup(spec: host.FieldSpec,
                                 subgroup_bits: int) -> List[int]:
    """w_i = 1 / prod_{j != i} (x_i - x_j) over the 2^bits subgroup
    (reference field/src/interpolation.rs:13-32)."""
    pts = host.two_adic_subgroup(spec, subgroup_bits)
    n = len(pts)
    p = spec.p
    prods = []
    for i in range(n):
        acc = 1
        for j in range(n):
            if j != i:
                acc = acc * (pts[i] - pts[j]) % p
        prods.append(acc)
    return host.batch_inv(prods, p)


def _sub_base(A, x, c: int):
    """ext-algebra x minus a base constant c."""
    out = list(x)
    out[0] = A.add_base_const(out[0], (-c) % A.spec.p)
    return out


def _partial_interpolate_a(A, domain: Sequence[int], values, weights,
                           x, init_eval, init_prod):
    """reference coset_interpolation.rs:608-635, generic over the algebra."""
    ev, prod = init_eval, init_prod
    for val, w, x_i in zip(values, weights, domain):
        val_w = [A.mul_base_const(c, w) for c in val]
        term = _sub_base(A, x, x_i)
        ev = ext_algebra_add(A, ext_algebra_mul(A, A.spec, ev, term),
                             ext_algebra_mul(A, A.spec, val_w, prod))
        prod = ext_algebra_mul(A, A.spec, prod, term)
    return ev, prod


class CosetInterpolationGate(Gate):
    def __init__(self, subgroup_bits: int, max_degree: int,
                 spec: host.FieldSpec = host.GOLDILOCKS):
        assert max_degree > 1
        self.subgroup_bits = subgroup_bits
        self.spec_ = spec
        self.D = spec.ext_degree
        n_points = 1 << subgroup_bits
        n_intermediates = (n_points - 2) // (max_degree - 1)
        # minimize degree for the given intermediate count
        # (reference coset_interpolation.rs:80-82)
        self.gate_degree = (n_points - 2) // (n_intermediates + 1) + 2
        self.barycentric_weights = barycentric_weights_subgroup(
            spec, subgroup_bits)
        self.domain = host.two_adic_subgroup(spec, subgroup_bits)

    @classmethod
    def from_serialized(cls, subgroup_bits: int, degree: int,
                        weights, spec: host.FieldSpec = host.GOLDILOCKS):
        """Reconstruct from serialized fields (reference
        coset_interpolation.rs deserialize); weights must match the
        fixed-subgroup barycentric weights."""
        g = cls.__new__(cls)
        g.subgroup_bits = subgroup_bits
        g.spec_ = spec
        g.D = spec.ext_degree
        g.gate_degree = degree
        g.barycentric_weights = list(weights)
        g.domain = host.two_adic_subgroup(spec, subgroup_bits)
        assert g.barycentric_weights == \
            barycentric_weights_subgroup(spec, subgroup_bits), \
            "serialized barycentric weights disagree with the subgroup"
        return g

    def id(self):
        return (f"{self.subgroup_bits},{self.gate_degree},"
                f"{self.barycentric_weights}<D={self.D}>")

    @property
    def num_points(self):
        return 1 << self.subgroup_bits

    def wire_shift(self):
        return 0

    def wires_value(self, i):
        return range(1 + i * self.D, 1 + (i + 1) * self.D)

    def _start_evaluation_point(self):
        return 1 + self.num_points * self.D

    def wires_evaluation_point(self):
        s = self._start_evaluation_point()
        return range(s, s + self.D)

    def wires_evaluation_value(self):
        s = self._start_evaluation_point() + self.D
        return range(s, s + self.D)

    def _start_intermediates(self):
        return self._start_evaluation_point() + 2 * self.D

    def num_routed(self):
        return self._start_intermediates()

    def num_intermediates(self):
        return (self.num_points - 2) // (self.gate_degree - 1)

    def wires_intermediate_eval(self, i):
        s = self._start_intermediates() + self.D * i
        return range(s, s + self.D)

    def wires_intermediate_prod(self, i):
        s = self._start_intermediates() + self.D * (self.num_intermediates()
                                                    + i)
        return range(s, s + self.D)

    def wires_shifted_evaluation_point(self):
        s = self._start_intermediates() + self.D * 2 * \
            self.num_intermediates()
        return range(s, s + self.D)

    def num_wires(self):
        return self._start_intermediates() + self.D * (
            2 * self.num_intermediates() + 1)

    def num_constants(self):
        return 0

    def degree(self):
        return self.gate_degree

    def num_constraints(self):
        return 2 * self.D + 2 * self.D * self.num_intermediates()

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        lw = vars.local_wires
        D = self.D
        constraints = []

        shift = lw[self.wire_shift()]
        eval_point = [lw[w] for w in self.wires_evaluation_point()]
        shifted_point = [lw[w]
                         for w in self.wires_shifted_evaluation_point()]
        constraints.extend(ext_algebra_sub(
            A, eval_point, ext_algebra_scalar_mul(A, shifted_point, shift)))

        values = [[lw[w] for w in self.wires_value(i)]
                  for i in range(self.num_points)]
        d = self.gate_degree
        zero = [A.zero()] * D
        one = [A.one()] + [A.zero()] * (D - 1)
        ev, prod = _partial_interpolate_a(
            A, self.domain[:d], values[:d], self.barycentric_weights[:d],
            shifted_point, zero, one)

        for i in range(self.num_intermediates()):
            inter_ev = [lw[w] for w in self.wires_intermediate_eval(i)]
            inter_prod = [lw[w] for w in self.wires_intermediate_prod(i)]
            constraints.extend(ext_algebra_sub(A, inter_ev, ev))
            constraints.extend(ext_algebra_sub(A, inter_prod, prod))
            start = 1 + (d - 1) * (i + 1)
            end = min(start + d - 1, self.num_points)
            ev, prod = _partial_interpolate_a(
                A, self.domain[start:end], values[start:end],
                self.barycentric_weights[start:end], shifted_point,
                inter_ev, inter_prod)

        eval_value = [lw[w] for w in self.wires_evaluation_value()]
        constraints.extend(ext_algebra_sub(A, eval_value, ev))
        return constraints

    def generators(self, row, local_constants, spec):
        return [_InterpolationGenerator(self, row, spec)]


class _InterpolationGenerator(gen.SimpleGenerator):
    def __init__(self, gate, row, spec):
        self.gate, self.row, self.spec = gate, row, spec

    def dependencies(self):
        g = self.gate
        deps = [tgt.wire(self.row, g.wire_shift())]
        for i in range(g.num_points):
            deps += [tgt.wire(self.row, w) for w in g.wires_value(i)]
        deps += [tgt.wire(self.row, w) for w in g.wires_evaluation_point()]
        return deps

    def run_once(self, witness, out):
        g = self.gate
        spec = self.spec
        get = lambda w: witness.get_target(tgt.wire(self.row, w))  # noqa

        shift = get(g.wire_shift())
        eval_point = tuple(get(w) for w in g.wires_evaluation_point())
        shifted = host.ext_scalar_mul(spec, eval_point,
                                      host.finv(shift, spec.p))
        for w, v in zip(g.wires_shifted_evaluation_point(), shifted):
            out.append((tgt.wire(self.row, w), v))

        values = [tuple(get(w) for w in g.wires_value(i))
                  for i in range(g.num_points)]
        d = g.gate_degree

        def pinterp(dom, vals, ws, ev, prod):
            for val, w, x_i in zip(vals, ws, dom):
                val_w = host.ext_scalar_mul(spec, val, w)
                term = host.ext_sub(spec, shifted,
                                    host.ext_from_base(spec, x_i))
                ev = host.ext_add(spec, host.ext_mul(spec, ev, term),
                                  host.ext_mul(spec, val_w, prod))
                prod = host.ext_mul(spec, prod, term)
            return ev, prod

        ev, prod = pinterp(g.domain[:d], values[:d],
                           g.barycentric_weights[:d],
                           host.ext_zero(spec), host.ext_one(spec))
        for i in range(g.num_intermediates()):
            for w, v in zip(g.wires_intermediate_eval(i), ev):
                out.append((tgt.wire(self.row, w), v))
            for w, v in zip(g.wires_intermediate_prod(i), prod):
                out.append((tgt.wire(self.row, w), v))
            start = 1 + (d - 1) * (i + 1)
            end = min(start + d - 1, g.num_points)
            ev, prod = pinterp(g.domain[start:end], values[start:end],
                               g.barycentric_weights[start:end], ev, prod)

        for w, v in zip(g.wires_evaluation_value(), ev):
            out.append((tgt.wire(self.row, w), v))
