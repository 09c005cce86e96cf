"""Gate framework (reference plonky2/src/gates/gate.rs:53-430).

A gate defines constraint polynomials over its row's local wires/constants.
Each gate's evaluation is written ONCE, generically over an *algebra* object
``A``, and instantiated in two ways:

- host extension algebra (python-int D-tuples) — used by the verifier at ζ
  (reference ``eval_unfiltered``);
- device base algebra (batched jnp field arrays over all quotient-domain
  points at once) — used by the prover's quotient evaluation (reference
  ``eval_unfiltered_base_batch``, but batched over the whole domain instead
  of 32-point chunks: on TPU the whole domain is one kernel).

Selector filtering (reference gate.rs:391-430): filter = prod over the
gate's selector-group of (i - s), plus the (UNUSED - s) factor when the
circuit has multiple selector polynomials.
"""

from __future__ import annotations

from typing import List, Sequence

from ..field import host

# Placeholder selector value for rows whose gate is in another group
# (reference gates/selectors.rs:14): u32::MAX reduced mod p at eval time.
UNUSED_SELECTOR = (1 << 32) - 1


class _FusedOpsMixin:
    """Default compositions for the fused operations the reference's
    hand-written circuit evaluators use (mul_add_extension & co).  The
    circuit algebra overrides these to emit the reference's exact gadget
    calls; for host/device algebras the compositions below produce the same
    field values, so native and batched evaluation are unaffected."""

    def mul_add(self, a, b, c):
        return self.add(self.mul(a, b), c)

    def mul_sub(self, a, b, c):
        return self.sub(self.mul(a, b), c)

    def mul_many(self, terms):
        out = None
        for t in terms:
            out = t if out is None else self.mul(out, t)
        return out if out is not None else self.one()

    def const_mul_add(self, c: int, x, acc):
        """c*x + acc with a host-known constant c (circuit: the constant is
        routed, reference mul_add_extension(constant_extension(c), x, acc))."""
        return self.add(self.mul_base_const(x, c), acc)

    def const_mul(self, c: int, x):
        """c*x with a host-known constant c (circuit: mul_const_extension —
        a routed constant target times x)."""
        return self.mul_base_const(x, c)

    def k_const_mul(self, k: int, x):
        """k*x with k a coset shift (circuit: scalar_mul_ext(constant(k), x),
        reference vanishing_poly.rs:906-910)."""
        return self.mul_base_const(x, k)

    def scalar_mul_add(self, s, b, c):
        """s*b + c with s a dynamic base-field scalar (challenge)."""
        return self.add(self.mul_scalar(b, s), c)

    def exp7(self, x):
        """x^7 (the Poseidon sbox; circuit: exp_u64_extension op order)."""
        x2 = self.mul(x, x)
        x3 = self.mul(x2, x)
        x4 = self.mul(x2, x2)
        return self.mul(x3, x4)

    def reduce_with_powers(self, terms, alpha):
        """sum_i alpha^i terms[i] (circuit: ReducingFactorTarget over
        Reducing(Extension)Gates, reference vanishing_poly.rs:977-984)."""
        from ..plonk import vanishing
        return vanishing.reduce_with_powers(self, terms, alpha)


class HostExtAlgebra(_FusedOpsMixin):
    """Extension-field algebra on python-int D-tuples (verifier side)."""

    def __init__(self, spec: host.FieldSpec):
        self.spec = spec

    def from_int(self, c: int):
        return host.ext_from_base(self.spec, c)

    def zero(self):
        return host.ext_zero(self.spec)

    def one(self):
        return host.ext_one(self.spec)

    def add(self, a, b):
        return host.ext_add(self.spec, a, b)

    def sub(self, a, b):
        return host.ext_sub(self.spec, a, b)

    def neg(self, a):
        return host.ext_neg(self.spec, a)

    def mul(self, a, b):
        return host.ext_mul(self.spec, a, b)

    def mul_base_const(self, a, c: int):
        return host.ext_scalar_mul(self.spec, a, c % self.spec.p)

    def add_base_const(self, a, c: int):
        return host.ext_add(self.spec, a, self.from_int(c))

    # "scalar" = a dynamic base-field challenge: an int on the host side
    def mul_scalar(self, a, s: int):
        return host.ext_scalar_mul(self.spec, a, s)

    def lift_scalar(self, s: int):
        return host.ext_from_base(self.spec, s)


class HostBaseAlgebra(_FusedOpsMixin):
    """Base-field algebra on python ints (witness generators, host checks)."""

    def __init__(self, spec: host.FieldSpec):
        self.spec = spec
        self.p = spec.p

    def from_int(self, c: int):
        return c % self.p

    def zero(self):
        return 0

    def one(self):
        return 1

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def neg(self, a):
        return (-a) % self.p

    def mul(self, a, b):
        return a * b % self.p

    def mul_base_const(self, a, c: int):
        return a * c % self.p

    def add_base_const(self, a, c: int):
        return (a + c) % self.p

    def mul_scalar(self, a, s: int):
        return a * s % self.p

    def lift_scalar(self, s: int):
        return s % self.p


class DeviceBaseAlgebra(_FusedOpsMixin):
    """Base-field algebra on batched device arrays (prover quotient side).

    ``F`` is a device field module (field.gl / field.bb); values are field
    arrays of shape (npoints,).
    """

    def __init__(self, F, npoints: int):
        self.F = F
        self.spec = F.SPEC
        self.npoints = npoints

    def from_int(self, c: int):
        return self.F.full((), c)   # scalar, broadcasts

    def zero(self):
        return self.F.zeros(())

    def one(self):
        return self.F.ones(())

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def neg(self, a):
        return self.F.neg(a)

    def mul(self, a, b):
        return self.F.mul(a, b)

    def mul_base_const(self, a, c: int):
        return self.F.mul_const(a, c)

    def add_base_const(self, a, c: int):
        return self.F.add(a, self.from_int(c))

    # "scalar" = a dynamic base-field challenge: a traced scalar field array
    # on the device side (keeps challenge values out of the compiled graph
    # so one compilation serves every proof)
    def mul_scalar(self, a, s):
        return self.F.mul(a, s)

    def lift_scalar(self, s):
        return s

    def mul_many(self, terms):
        terms = list(terms)
        if len(terms) <= 2:
            return super().mul_many(terms)
        # log-depth product (unrolled chains are pathological for XLA:CPU
        # compile time)
        import jax
        import jax.numpy as jnp
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *terms)
        return self.F.batch_prod(stacked, axis=0)


class EvaluationVars:
    """local_constants / local_wires are lists of algebra values;
    public_inputs_hash is a list of algebra values (reference plonk/vars.rs)."""

    def __init__(self, local_constants: Sequence, local_wires: Sequence,
                 public_inputs_hash: Sequence):
        self.local_constants = list(local_constants)
        self.local_wires = list(local_wires)
        self.public_inputs_hash = list(public_inputs_hash)

    def remove_prefix(self, n: int):
        self.local_constants = self.local_constants[n:]


class Gate:
    """Base gate.  Subclasses define:

    - id (reference Rust Debug-format string, for serialization parity)
    - num_wires / num_constants / degree / num_constraints
    - eval_unfiltered(A, vars) -> list of algebra values
    - generators(row, local_constants) -> list of SimpleGenerator
    - num_ops (slot capacity; 1 if the gate isn't slot-packed)
    """

    num_ops = 1

    def id(self) -> str:
        raise NotImplementedError

    def num_wires(self) -> int:
        raise NotImplementedError

    def num_constants(self) -> int:
        raise NotImplementedError

    def degree(self) -> int:
        raise NotImplementedError

    def num_constraints(self) -> int:
        raise NotImplementedError

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        raise NotImplementedError

    def generators(self, row: int, local_constants: Sequence[int],
                   spec) -> List:
        return []

    def extra_constant_wires(self) -> List:
        """(constant_index, wire_index) pairs the builder may use to route
        user constants (reference gate.rs:285)."""
        return []

    def complete_wires(self, builder, gate_idx: int, slot_idx: int) -> bool:
        """Fill a partially-used slot gate's remaining ops; return True if
        anything was completed (so its generators are retained).  Default:
        zeros satisfy the constraints, nothing to do (reference
        gate.rs:78-85)."""
        return False

    # identity / hashing via id string, like GateRef (reference gate.rs:311)
    def __eq__(self, other):
        return isinstance(other, Gate) and self.id() == other.id()

    def __hash__(self):
        return hash(self.id())

    def __repr__(self):
        return self.id()


def ext_algebra_mul(A, spec, a, b):
    """Multiply two extension-algebra elements (D-vectors of A-values) in
    F_D[X]/(X^D - W) — the counterpart of the reference's ExtensionAlgebra
    multiplication (field/src/extension_algebra.rs:13-128)."""
    d, w = spec.ext_degree, spec.ext_w
    acc = [None] * (2 * d - 1)
    for i in range(d):
        for j in range(d):
            t = A.mul(a[i], b[j])
            k = i + j
            acc[k] = t if acc[k] is None else A.add(acc[k], t)
    out = list(acc[:d])
    for k in range(d, 2 * d - 1):
        out[k - d] = A.add(out[k - d], A.mul_base_const(acc[k], w))
    return out


def ext_algebra_scalar_mul(A, a, s):
    """Scale a D-vector of A-values by one A-value."""
    return [A.mul(x, s) for x in a]


def ext_algebra_sub(A, a, b):
    return [A.sub(x, y) for x, y in zip(a, b)]


def ext_algebra_add(A, a, b):
    return [A.add(x, y) for x, y in zip(a, b)]


def compute_filter(A, row: int, group_range, s, many_selector: bool):
    """reference gate.rs:391-431 (the circuit side multiplies the terms with
    mul_many_extension; A.mul_many dispatches per algebra)."""
    terms = []
    for i in range(group_range[0], group_range[1]):
        if i != row:
            terms.append(A.sub(A.from_int(i), s))
    if many_selector:
        terms.append(A.sub(A.from_int(UNUSED_SELECTOR % A.spec.p), s))
    return A.mul_many(terms)


def eval_filtered(A, gate: Gate, vars: EvaluationVars, row: int,
                  selector_index: int, group_range, num_selectors: int,
                  num_lookup_selectors: int,
                  constraints_acc: List) -> None:
    """reference gate.rs:162-243: compute the filter, evaluate the gate
    unfiltered, and accumulate ``acc_j = filter * c_j + acc_j`` into the
    shared across-gates constraint vector (the circuit side emits
    mul_add_extension for each — reference gate.rs:239-242)."""
    filt = compute_filter(A, row, group_range,
                          vars.local_constants[selector_index],
                          num_selectors > 1)
    inner = EvaluationVars(
        vars.local_constants[num_selectors + num_lookup_selectors:],
        vars.local_wires, vars.public_inputs_hash)
    for j, c in enumerate(gate.eval_unfiltered(A, inner)):
        constraints_acc[j] = A.mul_add(filt, c, constraints_acc[j])
