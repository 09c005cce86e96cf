"""Circuit algebra: gate evaluation that EMITS a circuit.

The same generic ``Gate.eval_unfiltered(A, vars)`` that computes constraints
natively (host-ext at zeta) or batched on device (prover quotient) can run
over this algebra, whose values are ExtensionTargets and whose operations
call CircuitBuilder gadgets — yielding each gate's in-circuit constraint
evaluation (the reference's hand-written ``eval_unfiltered_circuit``,
gate.rs:150-161) from the single shared definition.  The reference requires
the two to match exactly ("the order ... should match exactly", gate.rs
note); here they cannot diverge by construction.
"""

from __future__ import annotations


class CircuitExtAlgebra:
    """Values are ExtensionTargets (tuples of D targets); ops emit gates."""

    def __init__(self, builder):
        self.b = builder
        self.spec = builder.spec

    def from_int(self, c: int):
        return self.b.constant_extension(c)

    def zero(self):
        return self.b.zero_extension()

    def one(self):
        return self.b.one_extension()

    def add(self, a, b):
        return self.b.add_extension(a, b)

    def sub(self, a, b):
        return self.b.sub_extension(a, b)

    def neg(self, a):
        return self.b.mul_const_extension(self.spec.p - 1, a)

    def mul(self, a, b):
        return self.b.mul_extension(a, b)

    def mul_base_const(self, a, c: int):
        return self.b.mul_const_extension(c, a)

    def add_base_const(self, a, c: int):
        return self.b.add_extension(a, self.b.constant_extension(c))

    # dynamic base-field scalars are Targets in-circuit
    def mul_scalar(self, a, s):
        return self.b.scalar_mul_ext(s, a)

    def lift_scalar(self, s):
        return self.b.convert_to_ext(s)
