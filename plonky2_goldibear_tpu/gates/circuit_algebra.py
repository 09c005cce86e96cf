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

    # -- fused ops: emit the reference's exact gadget calls ------------------

    def mul_add(self, a, b, c):
        return self.b.mul_add_extension(a, b, c)

    def mul_sub(self, a, b, c):
        return self.b.mul_sub_extension(a, b, c)

    def mul_many(self, terms):
        return self.b.mul_many_extension(terms)

    def const_mul_add(self, c: int, x, acc):
        """constant_extension(c) then mul_add (reference poseidon circuit
        helpers route the constant as a target)."""
        t = self.b.constant_extension(c)
        return self.b.mul_add_extension(t, x, acc)

    def const_mul(self, c: int, x):
        return self.b.mul_const_extension(c, x)

    def k_const_mul(self, k: int, x):
        """reference vanishing_poly.rs:906-910: builder.constant(k) then
        scalar_mul_ext."""
        return self.b.scalar_mul_ext(self.b.constant(k), x)

    def scalar_mul_add(self, s, b_, c):
        """beta (Target) * ext + ext via one arithmetic op (reference
        vanishing_poly.rs:943-952: convert_to_ext then mul_add_extension)."""
        beta_ext = self.b.convert_to_ext(s)
        return self.b.mul_add_extension(beta_ext, b_, c)

    def exp7(self, x):
        return self.b.exp_u64_extension(x, 7)

    def reduce_with_powers(self, terms, alpha):
        """reference vanishing_poly.rs:977-984: convert_to_ext the alpha
        Target, then ReducingFactorTarget::reduce."""
        from ..plonk.gadgets import ReducingFactorTarget

        alpha_ext = self.b.convert_to_ext(alpha)
        red = ReducingFactorTarget(alpha_ext)
        return red.reduce(list(terms), self.b)

    def poseidon_mds_layer(self, state):
        """Full-round Poseidon MDS via a dedicated PoseidonMdsGate instance,
        mirroring the reference's in-circuit fast path
        (hash/poseidon_goldilocks.rs:597-620 mds_layer_circuit: when there
        are enough routed wires, place one linear MDS gate and route the
        state through it instead of emitting ~WIDTH^2 arithmetic ops).
        Returns None when the gate does not fit, so the caller falls back to
        the naive per-row evaluation.  Native/batched algebras do not define
        this hook."""
        from ..iop import target as tgt
        from .poseidon_mds import PoseidonMdsGate

        gate = PoseidonMdsGate(self.spec.ext_degree)
        if self.b.config.num_routed_wires < gate.num_wires():
            return None
        row = self.b.add_gate(gate, [])
        width = len(state)
        for i in range(width):
            self.b.connect_extension(
                state[i],
                tuple(tgt.wire(row, w) for w in gate.wires_input(i)))
        return [tuple(tgt.wire(row, w) for w in gate.wires_output(i))
                for i in range(width)]

    # dynamic base-field scalars are Targets in-circuit
    def mul_scalar(self, a, s):
        return self.b.scalar_mul_ext(s, a)

    def lift_scalar(self, s):
        return self.b.convert_to_ext(s)
