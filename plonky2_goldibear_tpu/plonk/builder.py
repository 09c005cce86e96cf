"""Circuit builder (reference plonky2/src/plonk/circuit_builder.rs:144-1410,
gadgets/arithmetic.rs:30-165).

The builder is a host-side frontend that compiles a circuit into static
arrays (selector / constant / sigma tables) plus a generator list; the
compiled `CircuitData` drives the batched device prover.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..field import fft as fftm
from ..field import gl as gl_mod
from ..field import host
from ..fri.oracle import PolynomialBatch
from ..gates import selectors as selectors_mod
from ..gates.basic_gates import (ArithmeticGate, ConstantGate, NoopGate,
                                 PublicInputGate)
from ..hash import poseidon_gl
from ..iop import generator as gen
from ..iop import target as tgt
from .circuit_data import (CircuitData, CommonCircuitData,
                           ProverOnlyCircuitData, VerifierOnlyCircuitData)
from .config import CircuitConfig
from .permutation import Forest


@dataclass
class GateInstance:
    gate: object
    constants: List[int]


class _ExtInverseGenerator(gen.SimpleGenerator):
    """Witnesses 1/a for div/inverse gadgets (reference
    gadgets/arithmetic_extension.rs QuotientGeneratorExtension)."""

    def __init__(self, a, inv_targets, spec):
        self.a = a
        self.inv_targets = inv_targets
        self.spec = spec

    def dependencies(self):
        return list(self.a)

    def run_once(self, witness, out):
        vals = tuple(witness.get_target(t) for t in self.a)
        inv = host.ext_inv(self.spec, vals)
        for t, v in zip(self.inv_targets, inv):
            out.append((t, v))


class CircuitBuilder:
    def __init__(self, config: CircuitConfig,
                 spec: host.FieldSpec = host.GOLDILOCKS,
                 F=None, hasher=None):
        self.config = config
        self.spec = spec
        if F is None:
            if spec.name == "goldilocks":
                F = gl_mod
            else:
                from ..field import bb as bb_mod
                F = bb_mod
        # InnerHasher = the spec's algebraic hasher (in-circuit gadgets, PI
        # hashing); Hasher = the Merkle/transcript hasher, which may be
        # Keccak for outermost proofs (reference config.rs:175-216)
        if spec.name == "goldilocks":
            inner_hasher = poseidon_gl
        else:
            from ..hash import poseidon2_bb
            inner_hasher = poseidon2_bb
        if hasher is None:
            hasher = inner_hasher
        self.F = F
        self.hasher = hasher
        self.inner_hasher = inner_hasher
        # optional circuit-digest domain separator
        # (reference circuit_builder.rs:1301)
        self.domain_separator: List[int] = []
        # cyclic-recursion state (reference circuit_builder.rs:452,1332)
        self.verifier_data_public_input = None
        self.goal_common_data = None
        self.gate_instances: List[GateInstance] = []
        self.gates: Dict[str, object] = {}
        self.copy_constraints: List[Tuple[tgt.Target, tgt.Target]] = []
        self.virtual_target_index = 0
        self.public_inputs: List[tgt.Target] = []
        self.constants_to_targets: Dict[int, tgt.Target] = {}
        self.targets_to_constants: Dict[tgt.Target, int] = {}
        self.constant_generators: List[gen.ConstantGenerator] = []
        self.generators: List = []
        # slot packing: gate id -> {params tuple: (row, op)}
        # (reference circuit_builder.rs:824-853)
        self.current_slots: Dict[str, Dict[Tuple, Tuple[int, int]]] = {}
        self._slot_gates: Dict[str, object] = {}
        self.base_arithmetic_results: Dict[Tuple, tgt.Target] = {}
        self._ext_arithmetic_results: Dict[Tuple, Tuple] = {}
        # lookup bookkeeping (reference circuit_builder.rs:194-197,302-335)
        self.luts: List[Tuple[Tuple[int, int], ...]] = []
        self.lut_to_lookups: List[List[Tuple]] = []
        self.lookup_rows: List[Tuple[int, int, int]] = []
        # gate-count profiler (reference util/context_tree.rs:12,134)
        from ..utils.context_tree import ContextTree
        self.context_tree = ContextTree()

    # -- targets -------------------------------------------------------------

    def add_virtual_target(self) -> tgt.Target:
        t = tgt.virtual_target(self.virtual_target_index)
        self.virtual_target_index += 1
        return t

    def add_virtual_targets(self, n: int) -> List[tgt.Target]:
        return [self.add_virtual_target() for _ in range(n)]

    def register_public_input(self, t: tgt.Target):
        self.public_inputs.append(t)

    def register_public_inputs(self, ts: Sequence[tgt.Target]):
        for t in ts:
            self.register_public_input(t)

    def num_gates(self) -> int:
        return len(self.gate_instances)

    # -- gate-count contexts (reference circuit_builder.rs:719-725) ---------

    def push_context(self, name: str):
        self.context_tree.push(name, self.num_gates())

    def pop_context(self):
        self.context_tree.pop(self.num_gates())

    def print_gate_counts(self, min_delta: int = 1) -> str:
        """Render per-context gate counts (reference context_tree.rs:134 /
        circuit_builder.rs:1042-1058); returns the report and logs it."""
        import logging
        final = self.num_gates()
        tree = self.context_tree.filter(final, min_delta)
        report = "\n".join(tree.lines(final))
        logging.getLogger(__name__).debug(report)
        return report

    # -- gates ---------------------------------------------------------------

    def add_gate(self, gate, constants: Sequence[int]) -> int:
        assert gate.num_wires() <= self.config.num_wires, \
            f"{gate.id()} needs {gate.num_wires()} wires"
        assert gate.num_constants() <= self.config.num_constants or \
            isinstance(gate, ConstantGate), gate.id()
        constants = [c % self.spec.p for c in constants]
        assert len(constants) <= gate.num_constants(), "Too many constants."
        constants = constants + [0] * (gate.num_constants() - len(constants))
        row = len(self.gate_instances)
        for ci, wi in gate.extra_constant_wires():
            self.constant_generators.append(
                gen.ConstantGenerator(row, ci, wi, 0))
        self.gates[gate.id()] = gate
        self.gate_instances.append(GateInstance(gate, constants))
        return row

    def add_gate_to_gate_set(self, gate):
        """Register a gate type without placing an instance (used to
        uniformize gate sets across conditionally-recursive circuits,
        reference circuit_builder.rs:533-537)."""
        self.gates[gate.id()] = gate

    def find_slot(self, gate, params: Sequence[int],
                  constants: Sequence[int]) -> Tuple[int, int]:
        """reference circuit_builder.rs:824-853."""
        num_gates = self.num_gates()
        num_ops = gate.num_ops
        self._slot_gates[gate.id()] = gate
        slots = self.current_slots.setdefault(gate.id(), {})
        key = tuple(int(x) % self.spec.p for x in params)
        if key in slots:
            gate_idx, slot_idx = slots[key]
        else:
            self.add_gate(gate, list(constants))
            gate_idx, slot_idx = num_gates, 0
        if slot_idx == num_ops - 1:
            slots.pop(key, None)
        else:
            slots[key] = (gate_idx, slot_idx + 1)
        return gate_idx, slot_idx

    # -- copy constraints / constants ----------------------------------------

    def connect(self, x: tgt.Target, y: tgt.Target):
        assert tgt.is_routable(x, self.config.num_routed_wires), x
        assert tgt.is_routable(y, self.config.num_routed_wires), y
        self.copy_constraints.append((x, y))

    def assert_equal(self, x, y):
        self.connect(x, y)

    def constant(self, c: int) -> tgt.Target:
        c %= self.spec.p
        if c in self.constants_to_targets:
            return self.constants_to_targets[c]
        t = self.add_virtual_target()
        self.constants_to_targets[c] = t
        self.targets_to_constants[t] = c
        return t

    def constants(self, cs: Sequence[int]) -> List[tgt.Target]:
        return [self.constant(c) for c in cs]

    def zero(self) -> tgt.Target:
        return self.constant(0)

    def one(self) -> tgt.Target:
        return self.constant(1)

    def two(self) -> tgt.Target:
        return self.constant(2)

    def neg_one(self) -> tgt.Target:
        return self.constant(self.spec.p - 1)

    def target_as_constant(self, t: tgt.Target) -> Optional[int]:
        return self.targets_to_constants.get(t)

    def add_simple_generator(self, g):
        self.generators.append(g)

    def generate_copy(self, src, dst):
        self.add_simple_generator(gen.CopyGenerator(src, dst))

    # -- arithmetic gadget (reference gadgets/arithmetic.rs) ------------------

    def arithmetic(self, const_0: int, const_1: int, m0: tgt.Target,
                   m1: tgt.Target, addend: tgt.Target) -> tgt.Target:
        p = self.spec.p
        const_0 %= p
        const_1 %= p
        special = self._arithmetic_special_cases(const_0, const_1, m0, m1,
                                                 addend)
        if special is not None:
            return special
        op = (const_0, const_1, m0, m1, addend)
        if op in self.base_arithmetic_results:
            return self.base_arithmetic_results[op]
        result = self._add_base_arithmetic_operation(op)
        self.base_arithmetic_results[op] = result
        return result

    def _arithmetic_special_cases(self, c0, c1, m0, m1, addend):
        p = self.spec.p
        zero = self.zero()
        mc0 = self.target_as_constant(m0)
        mc1 = self.target_as_constant(m1)
        ac = self.target_as_constant(addend)
        first_zero = c0 == 0 or m0 == zero or m1 == zero
        second_zero = c1 == 0 or addend == zero
        first_const = 0 if first_zero else (
            mc0 * mc1 % p * c0 % p if (mc0 is not None and mc1 is not None)
            else None)
        second_const = 0 if second_zero else (
            ac * c1 % p if ac is not None else None)
        if first_const is not None and second_const is not None:
            return self.constant((first_const + second_const) % p)
        if first_zero and c1 == 1:
            return addend
        if second_zero:
            if mc0 is not None and mc0 * c0 % p == 1:
                return m1
            if mc1 is not None and mc1 * c0 % p == 1:
                return m0
        return None

    def _add_base_arithmetic_operation(self, op) -> tgt.Target:
        c0, c1, m0, m1, addend = op
        gate = ArithmeticGate.from_config(self.config)
        row, i = self.find_slot(gate, [c0, c1], [c0, c1])
        w0, w1, wa, wo = ArithmeticGate.wires(i)
        self.connect(m0, tgt.wire(row, w0))
        self.connect(m1, tgt.wire(row, w1))
        self.connect(addend, tgt.wire(row, wa))
        return tgt.wire(row, wo)

    def add(self, x, y):
        # x + y = 1 * x * 1 + 1 * y (reference arithmetic.rs:197-202)
        return self.arithmetic(1, 1, x, self.one(), y)

    def sub(self, x, y):
        return self.arithmetic(1, self.spec.p - 1, x, self.one(), y)

    def mul(self, x, y):
        # x * y = 1 * x * y + 0 * x — the addend is x, not zero (reference
        # arithmetic.rs:244-247); the wiring difference is digest-relevant
        return self.arithmetic(1, 0, x, y, x)

    def mul_add(self, x, y, z):
        return self.arithmetic(1, 1, x, y, z)

    def mul_sub(self, x, y, z):
        return self.arithmetic(1, self.spec.p - 1, x, y, z)

    def mul_const(self, c, x):
        # routes a constant TARGET (reference arithmetic.rs:180-183)
        return self.mul(self.constant(c), x)

    def mul_const_add(self, c, x, y):
        return self.mul_add(self.constant(c), x, y)

    def add_const(self, x, c):
        return self.add(x, self.constant(c))

    def square(self, x):
        return self.mul(x, x)

    def cube(self, x):
        return self.mul_many([x, x, x])

    # reference arithmetic.rs:23 — exactly this addend count uses AddManyGate
    ADD_MANY_THRESHOLD = 23

    def add_many(self, xs):
        from ..gates.misc_gates import AddManyGate
        addends = list(xs)
        n = len(addends)
        if n == self.ADD_MANY_THRESHOLD:
            gate = AddManyGate.from_config(self.config,
                                           self.ADD_MANY_THRESHOLD)
            row, i = self.find_slot(gate, [], [])
            for t, w in zip(addends, gate.wires_addends(i)):
                self.connect(t, tgt.wire(row, w))
            return tgt.wire(row, gate.wire_sum(i))
        if n < self.ADD_MANY_THRESHOLD:
            out = self.zero()
            for x in addends:
                out = self.add(out, x)
            return out
        chunks = [self.add_many(addends[k:k + self.ADD_MANY_THRESHOLD])
                  for k in range(0, n, self.ADD_MANY_THRESHOLD)]
        return self.add_many(chunks)

    def mul_many(self, xs):
        out = self.one()
        for x in xs:
            out = self.mul(out, x)
        return out

    def assert_zero(self, x):
        self.connect(x, self.zero())

    def assert_one(self, x):
        self.connect(x, self.one())

    # -- lookups (reference gadgets/lookup.rs:54-160,
    #    circuit_builder.rs:744-819) -----------------------------------------

    def add_lookup_table_from_pairs(self, pairs) -> int:
        lut = tuple((int(i) & 0xFFFF, int(o) & 0xFFFF) for i, o in pairs)
        if lut in self.luts:
            return self.luts.index(lut)
        self.luts.append(lut)
        self.lut_to_lookups.append([])
        return len(self.luts) - 1

    def add_lookup_table_from_table(self, inputs, outputs) -> int:
        return self.add_lookup_table_from_pairs(list(zip(inputs, outputs)))

    def add_lookup_table_from_fn(self, f, inputs) -> int:
        return self.add_lookup_table_from_pairs([(i, f(i)) for i in inputs])

    def add_lookup_from_index(self, looking_in: tgt.Target,
                              lut_index: int) -> tgt.Target:
        assert lut_index < len(self.luts), "unknown lookup table"
        looking_out = self.add_virtual_target()
        self.lut_to_lookups[lut_index].append((looking_in, looking_out))
        return looking_out

    def _add_all_lookups(self):
        """Place LookupGate / LookupTableGate rows (reference
        gadgets/lookup.rs:83-157).  Rows are deliberately upside down so the
        transition constraints only need this row + the next."""
        from ..gates.lookup_gates import LookupGate, LookupTableGate
        for lut_index, lut in enumerate(self.luts):
            lookups = self.lut_to_lookups[lut_index]
            assert lookups, f"LUT {lut_index} is unused"
            last_lu_gate = self.num_gates()
            gate = LookupGate.from_config(self.config, lut)
            num_slots = gate.num_slots
            full, rem = divmod(len(lookups), num_slots)
            for c in range(full):
                row = self.add_gate(gate, [])
                for i, (lin, lout) in enumerate(
                        lookups[c * num_slots:(c + 1) * num_slots]):
                    self.connect(lin, tgt.wire(
                        row, LookupGate.wire_ith_looking_inp(i)))
                    self.connect(lout, tgt.wire(
                        row, LookupGate.wire_ith_looking_out(i)))
            for lin, lout in lookups[full * num_slots:]:
                row, i = self.find_slot(gate, [lut_index], [])
                self.connect(lin, tgt.wire(
                    row, LookupGate.wire_ith_looking_inp(i)))
                self.connect(lout, tgt.wire(
                    row, LookupGate.wire_ith_looking_out(i)))

            last_lut_gate = self.num_gates()
            num_lut_entries = LookupTableGate.num_slots_of(self.config)
            num_lut_rows = (len(lut) - 1) // num_lut_entries + 1
            tgate = LookupTableGate(num_lut_entries, lut, last_lut_gate)
            for _ in range(num_lut_rows):
                self.add_gate(tgate, [])
            first_lut_gate = self.num_gates() - 1
            # all-zero next row makes the initial constraints plain zero
            # checks (reference gadgets/lookup.rs:146-149)
            self.add_gate(NoopGate(), [])
            self.lookup_rows.append((last_lu_gate, last_lut_gate,
                                     first_lut_gate))

    # -- extension-target gadgets (reference gadgets/arithmetic_extension.rs,
    #    iop/ext_target.rs).  An ExtensionTarget is a tuple of D targets. ---

    @property
    def D(self) -> int:
        return self.spec.ext_degree

    def add_virtual_extension_target(self) -> Tuple[tgt.Target, ...]:
        return tuple(self.add_virtual_target() for _ in range(self.D))

    def add_virtual_extension_targets(self, n: int):
        return [self.add_virtual_extension_target() for _ in range(n)]

    def constant_extension(self, coeffs) -> Tuple[tgt.Target, ...]:
        if isinstance(coeffs, int):
            coeffs = (coeffs,) + (0,) * (self.D - 1)
        assert len(coeffs) == self.D
        return tuple(self.constant(c) for c in coeffs)

    def zero_extension(self):
        return self.constant_extension(0)

    def one_extension(self):
        return self.constant_extension(1)

    def convert_to_ext(self, t: tgt.Target) -> Tuple[tgt.Target, ...]:
        return (t,) + (self.zero(),) * (self.D - 1)

    def connect_extension(self, a, b):
        for x, y in zip(a, b):
            self.connect(x, y)

    def target_as_constant_ext(self, a) -> Optional[Tuple[int, ...]]:
        cs = tuple(self.target_as_constant(t) for t in a)
        return None if any(c is None for c in cs) else cs

    def arithmetic_extension(self, const_0: int, const_1: int, m0, m1,
                             addend) -> Tuple[tgt.Target, ...]:
        """c0*m0*m1 + c1*addend over the extension — faithful port of the
        reference gadget pipeline (gadgets/arithmetic_extension.rs:27-115):
        special-case folding first, then one result cache keyed on the full
        operation, then a MulExtensionGate slot when the addend is the zero
        constant, else an ArithmeticExtensionGate slot."""
        p = self.spec.p
        const_0 %= p
        const_1 %= p
        special = self._arithmetic_extension_special_cases(
            const_0, const_1, m0, m1, addend)
        if special is not None:
            return special
        op = (const_0, const_1, m0, m1, addend)
        if op in self._ext_arithmetic_results:
            return self._ext_arithmetic_results[op]
        if self.target_as_constant_ext(addend) == (0,) * self.D:
            result = self._compute_mul_extension_operation(const_0, m0, m1)
        else:
            result = self._compute_arithmetic_extension_operation(op)
        self._ext_arithmetic_results[op] = result
        return result

    def _arithmetic_extension_special_cases(self, const_0, const_1, m0, m1,
                                            addend):
        """reference arithmetic_extension.rs:117-171."""
        spec = self.spec
        zero = self.zero_extension()
        mc0 = self.target_as_constant_ext(m0)
        mc1 = self.target_as_constant_ext(m1)
        ac = self.target_as_constant_ext(addend)
        first_zero = const_0 == 0 or m0 == zero or m1 == zero
        second_zero = const_1 == 0 or addend == zero
        zero_v = (0,) * self.D
        first_const = None
        if first_zero:
            first_const = zero_v
        elif mc0 is not None and mc1 is not None:
            first_const = host.ext_scalar_mul(
                spec, host.ext_mul(spec, mc0, mc1), const_0)
        second_const = None
        if second_zero:
            second_const = zero_v
        elif ac is not None:
            second_const = host.ext_scalar_mul(spec, ac, const_1)
        if first_const is not None and second_const is not None:
            return self.constant_extension(
                host.ext_add(spec, first_const, second_const))
        if first_zero and const_1 == 1:
            return addend
        if second_zero:
            one_v = host.ext_one(spec)
            if mc0 is not None and \
                    host.ext_scalar_mul(spec, mc0, const_0) == one_v:
                return m1
            if mc1 is not None and \
                    host.ext_scalar_mul(spec, mc1, const_0) == one_v:
                return m0
        return None

    def _compute_arithmetic_extension_operation(self, op):
        from ..gates.extension_gates import ArithmeticExtensionGate
        const_0, const_1, m0, m1, addend = op
        gate = ArithmeticExtensionGate.from_config(self.config, self.D)
        row, i = self.find_slot(gate, [const_0, const_1], [const_0, const_1])
        m0r, m1r, adr, outr = gate.wires_op(i)
        for t, w in zip(m0, m0r):
            self.connect(t, tgt.wire(row, w))
        for t, w in zip(m1, m1r):
            self.connect(t, tgt.wire(row, w))
        for t, w in zip(addend, adr):
            self.connect(t, tgt.wire(row, w))
        return tuple(tgt.wire(row, w) for w in outr)

    def _compute_mul_extension_operation(self, const_0: int, m0, m1):
        from ..gates.extension_gates import MulExtensionGate
        gate = MulExtensionGate.from_config(self.config, self.D)
        row, i = self.find_slot(gate, [const_0], [const_0])
        m0r, m1r, outr = gate.wires_op(i)
        for t, w in zip(m0, m0r):
            self.connect(t, tgt.wire(row, w))
        for t, w in zip(m1, m1r):
            self.connect(t, tgt.wire(row, w))
        return tuple(tgt.wire(row, w) for w in outr)

    def mul_extension_with_const(self, const_0: int, m0, m1):
        return self.arithmetic_extension(const_0, 0, m0, m1,
                                         self.zero_extension())

    def add_extension(self, a, b):
        # 1 * one * a + 1 * b (reference arithmetic_extension.rs:199-206:
        # the multiplicands are (one, a) — wiring order is digest-relevant)
        return self.arithmetic_extension(1, 1, self.one_extension(), a, b)

    def sub_extension(self, a, b):
        return self.arithmetic_extension(1, self.spec.p - 1,
                                         self.one_extension(), a, b)

    def mul_extension(self, a, b):
        return self.mul_extension_with_const(1, a, b)

    def square_extension(self, a):
        return self.mul_extension(a, a)

    def cube_extension(self, a):
        return self.mul_many_extension([a, a, a])

    def mul_add_extension(self, a, b, c):
        return self.arithmetic_extension(1, 1, a, b, c)

    def mul_sub_extension(self, a, b, c):
        return self.arithmetic_extension(1, self.spec.p - 1, a, b, c)

    def mul_const_extension(self, c: int, a):
        # routes a constant TARGET (reference arithmetic_extension.rs:350-353)
        return self.mul_extension(self.constant_extension(c), a)

    def mul_const_add_extension(self, c: int, a, b):
        return self.mul_add_extension(self.constant_extension(c), a, b)

    def add_const_extension(self, a, c: int):
        return self.add_extension(a, self.constant_extension(c))

    def scalar_mul_ext(self, s: tgt.Target, a):
        """base target * ext target."""
        return self.mul_extension(self.convert_to_ext(s), a)

    def scalar_mul_add_extension(self, s: tgt.Target, b, c):
        return self.arithmetic_extension(1, 1, self.convert_to_ext(s), b, c)

    def scalar_mul_sub_extension(self, s: tgt.Target, b, c):
        return self.arithmetic_extension(1, self.spec.p - 1,
                                         self.convert_to_ext(s), b, c)

    def add_many_extension(self, terms):
        acc = self.zero_extension()
        for t in terms:
            acc = self.add_extension(acc, t)
        return acc

    def mul_many_extension(self, terms):
        acc = self.one_extension()
        for t in terms:
            acc = self.mul_extension(acc, t)
        return acc

    def exp_u64_extension(self, base, exponent: int):
        """base^e for a host-known exponent (reference
        arithmetic_extension.rs:442-467: small-exponent shortcuts, then
        LSB-first square-and-multiply)."""
        if exponent == 0:
            return self.one_extension()
        if exponent == 1:
            return base
        if exponent == 2:
            return self.square_extension(base)
        if exponent == 3:
            return self.cube_extension(base)
        result = self.one_extension()
        b = base
        e = exponent
        while e:
            if e & 1:
                result = self.mul_extension(result, b)
            e >>= 1
            if e:
                b = self.square_extension(b)
        return result

    def div_add_extension(self, x, y, z):
        """x / y + z: witnessed inverse of y, product check, then one fused
        mul_add (reference gadgets/arithmetic_extension.rs:479-498)."""
        inv = self.add_virtual_extension_target()
        self.add_simple_generator(_ExtInverseGenerator(y, inv, self.spec))
        y_inv = self.mul_extension(y, inv)
        self.connect_extension(y_inv, self.one_extension())
        return self.mul_add_extension(x, inv, z)

    def div_extension(self, a, b):
        return self.div_add_extension(a, b, self.zero_extension())

    def inverse_extension(self, a):
        """1/a (reference arithmetic_extension.rs:501-504: div(one, a))."""
        return self.div_extension(self.one_extension(), a)

    # -- hashing gadgets (reference plonk/config.rs:97-166,
    #    hash/poseidon_goldilocks.rs permute_swapped impl) ------------------

    def permute_swapped(self, state: Sequence[tgt.Target],
                        swap: tgt.Target,
                        hasher=None) -> List[tgt.Target]:
        """One permutation-gate op: permute `state`, conditionally swapping
        the first two digest-size chunks (Poseidon width-12 for Goldilocks,
        Poseidon2 width-16 / risc0-Poseidon2 width-24 for BabyBear).
        ``hasher`` selects the AlgebraicHasher; default = the config's
        InnerHasher."""
        hasher = hasher or self.inner_hasher
        if getattr(hasher, "WIDTH", None) == 24:
            from ..gates.poseidon2_r0_bb_gate import Poseidon2R0BabyBearGate
            g = Poseidon2R0BabyBearGate.from_config(self.config)
            row, op = self.find_slot(g, [], [])
            self.connect(swap, tgt.wire(row, g.wire_swap(op)))
            for i, s in enumerate(state):
                self.connect(s, tgt.wire(row, g.wire_input(op, i)))
            return [tgt.wire(row, g.wire_output(op, i))
                    for i in range(len(state))]
        if self.spec.name == "goldilocks":
            from ..gates.poseidon import PoseidonGate
            g = PoseidonGate()
            row = self.add_gate(g, [])
            self.connect(swap, tgt.wire(row, PoseidonGate.WIRE_SWAP))
            for i, s in enumerate(state):
                self.connect(s, tgt.wire(row, PoseidonGate.wire_input(i)))
            return [tgt.wire(row, PoseidonGate.wire_output(i))
                    for i in range(len(state))]
        from ..gates.poseidon2_bb_gate import Poseidon2BabyBearGate
        g = Poseidon2BabyBearGate.from_config(self.config)
        row, op = self.find_slot(g, [], [])
        self.connect(swap, tgt.wire(row, g.wire_swap(op)))
        for i, s in enumerate(state):
            self.connect(s, tgt.wire(row, g.wire_input(op, i)))
        return [tgt.wire(row, g.wire_output(op, i))
                for i in range(len(state))]

    def permute(self, state: Sequence[tgt.Target],
                hasher=None) -> List[tgt.Target]:
        return self.permute_swapped(state, self.zero(), hasher)

    def hash_n_to_m_no_pad(self, inputs: Sequence[tgt.Target],
                           num_outputs: int,
                           hasher=None) -> List[tgt.Target]:
        """Overwrite-mode sponge in-circuit (reference config.rs:135-166);
        ``hasher`` = any AlgebraicHasher module (default InnerHasher)."""
        hasher = hasher or self.inner_hasher
        rate = hasher.RATE
        width = hasher.WIDTH
        # the risc0 sponge zero-fills short chunks to the full rate
        # (reference poseidon2_risc0_babybear.rs:249-254)
        zero_pad = width == 24
        state = [self.zero()] * width
        for i in range(0, len(inputs), rate):
            chunk = list(inputs[i:i + rate])
            if zero_pad:
                chunk += [self.zero()] * (rate - len(chunk))
            state = chunk + state[len(chunk):]
            state = self.permute(state, hasher)
        outputs: List[tgt.Target] = []
        while True:
            for s in state[:rate]:
                outputs.append(s)
                if len(outputs) == num_outputs:
                    return outputs
            state = self.permute(state, hasher)

    def hash_n_to_hash_no_pad(self, inputs: Sequence[tgt.Target],
                              hasher=None) -> List[tgt.Target]:
        return self.hash_n_to_m_no_pad(inputs, self.spec.num_hash_out_elts,
                                       hasher)

    def hash_or_noop(self, inputs: Sequence[tgt.Target],
                     hasher=None) -> List[tgt.Target]:
        n = self.spec.num_hash_out_elts
        if len(inputs) <= n:
            return list(inputs) + [self.zero()] * (n - len(inputs))
        return self.hash_n_to_hash_no_pad(inputs, hasher)

    # -- build (reference circuit_builder.rs:1110-1360) -----------------------

    def build(self, commit_streaming: bool = False) -> CircuitData:
        """``commit_streaming``: commit constants+sigmas via the
        memory-lean streaming oracle (coeffs + digest levels only, no
        resident LDE/leaves) — required for degrees whose dense LDE
        exceeds device memory; such circuits prove via
        plonk/prover_large.py:prove_large.  Caps are bit-identical."""
        config = self.config
        spec = self.spec
        p = spec.p
        rate_bits = config.fri_config.rate_bits
        cap_height = config.fri_config.cap_height

        num_public_inputs = len(self.public_inputs)
        # In-circuit public-input hashing via Poseidon gates (reference
        # circuit_builder.rs:1129-1139).  hash_n_to_m of an empty input
        # squeezes the all-zero state without permuting (reference
        # hash/hashing.rs:100-124), so 0 public inputs add no hash gates.
        pi_hash_targets = self.hash_n_to_m_no_pad(
            self.public_inputs, spec.num_hash_out_elts)
        pi_gate = self.add_gate(PublicInputGate(spec.num_hash_out_elts), [])
        for i, t in enumerate(pi_hash_targets):
            self.connect(t, tgt.wire(pi_gate, i))

        # complete partially-filled slot gates whose constraints are not
        # satisfied by all-zero wires (reference circuit_builder.rs:1082)
        for gate_id, slots in list(self.current_slots.items()):
            gate = self._slot_gates[gate_id]
            for params, (gate_idx, slot_idx) in list(slots.items()):
                if gate.complete_wires(self, gate_idx, slot_idx):
                    slots.pop(params, None)

        # place LUT-related gates (reference circuit_builder.rs:1142)
        self._add_all_lookups()

        # anti-#456 randomization (reference circuit_builder.rs:1064-1080)
        random_wire = None
        for w in range(spec.num_hash_out_elts, config.num_wires):
            if w == config.num_wires - 1:
                random_wire = (pi_gate, w)
            self.add_simple_generator(
                gen.RandomValueGenerator(tgt.wire(pi_gate, w), p))

        # constant gates + routing (reference circuit_builder.rs:1145-1172)
        while len(self.constants_to_targets) > len(self.constant_generators):
            self.add_gate(ConstantGate(config.num_constants), [])
        pairs = sorted(self.constants_to_targets.items(), key=lambda kv: kv[0])
        for (c, t), cg in zip(pairs, self.constant_generators):
            self.gate_instances[cg.row].constants[cg.constant_index] = c
            self.connect(tgt.wire(cg.row, cg.wire_index), t)
            cg.constant = c
            self.add_simple_generator(cg)

        # blind (zk) and pad to a power of two
        # (reference circuit_builder.rs:924-980 blind_and_pad)
        if config.zero_knowledge:
            self._blind()
        while len(self.gate_instances) & (len(self.gate_instances) - 1):
            self.add_gate(NoopGate(), [])

        degree = len(self.gate_instances)
        degree_bits = host.log2_strict(degree)
        fri_params = config.fri_config.fri_params(degree_bits,
                                                  config.zero_knowledge)
        assert fri_params.total_arities() <= degree_bits + rate_bits - \
            cap_height, "FRI total reduction arity is too large."

        quotient_degree_factor = config.max_quotient_degree_factor
        gates = sorted(self.gates.values(), key=lambda g: (g.degree(), g.id()))
        selector_polys, selectors_info = selectors_mod.selector_polynomials(
            gates, self.gate_instances, quotient_degree_factor + 1, p)

        constant_vecs = list(selector_polys)
        num_lookup_selectors = 0
        if self.luts:
            lookup_sels = selectors_mod.selectors_lookup(degree,
                                                         self.lookup_rows)
            lookup_ends = selectors_mod.selector_ends_lookups(
                degree, self.lookup_rows)
            constant_vecs += lookup_sels + lookup_ends
            num_lookup_selectors = len(lookup_sels) + len(lookup_ends)
        constant_vecs += self._constant_polys(gates)
        num_constants = len(constant_vecs)

        subgroup = host.two_adic_subgroup(spec, degree_bits)
        k_is = host.get_unique_coset_shifts(spec, degree,
                                            config.num_routed_wires)
        sigma_vecs, forest = self._sigma_vecs(k_is, subgroup)

        constants_sigmas = np.stack(
            [np.asarray(v, dtype=np.uint64) for v in constant_vecs]
            + [sigma_vecs[j] for j in range(len(k_is))])
        if commit_streaming:
            from ..fri.oracle import StreamingPolynomialBatch
            constants_sigmas_commitment = \
                StreamingPolynomialBatch.from_values(
                    self.F, self.F.from_ints(constants_sigmas), rate_bits,
                    cap_height, hasher=self.hasher)
        else:
            constants_sigmas_commitment = PolynomialBatch.from_values(
                self.F, self.F.from_ints(constants_sigmas), rate_bits,
                cap_height, hasher=self.hasher)

        # gate generators, minus unused slot ops
        # (reference circuit_builder.rs:1252-1267)
        incomplete = {}
        for slots in self.current_slots.values():
            for (gate_idx, op) in slots.values():
                incomplete[gate_idx] = op
        for row, inst in enumerate(self.gate_instances):
            gens = inst.gate.generators(row, inst.constants, spec)
            if row in incomplete:
                gens = gens[: incomplete[row]]
            self.generators.extend(gens)

        # index generators by watched representative
        by_watches: Dict[int, List[int]] = {}
        for i, g in enumerate(self.generators):
            for watch in g.watch_list():
                widx = forest.target_index(watch)
                rep = int(forest.parents[widx])
                by_watches.setdefault(rep, []).append(i)
        for v in by_watches.values():
            # dedup, preserving order
            seen = set()
            v[:] = [x for x in v if not (x in seen or seen.add(x))]

        num_gate_constraints = max(g.num_constraints() for g in gates)
        num_partial_products = (
            -(-config.num_routed_wires // quotient_degree_factor) - 1)

        # circuit digest (reference circuit_builder.rs:1300-1320); byte
        # digests (Keccak) flatten to field elements via GenericHashOut
        # semantics before re-hashing
        cap_flat = [x for row in constants_sigmas_commitment.cap_host()
                    for x in self._digest_elements(row)]
        domain_sep_digest = self._digest_elements(
            self._hash_pad(self.domain_separator))
        circuit_digest = self.hasher.hash_no_pad_host(
            cap_flat + domain_sep_digest + [degree_bits])

        # lookup poly count: 1 RE + ceil(slots / (qdf - 1)) partial SLDCs
        # (reference circuit_builder.rs:1290-1299)
        from ..gates.lookup_gates import LookupGate
        num_lookup_polys = 0
        if self.luts:
            lookup_degree = config.max_quotient_degree_factor - 1
            num_lookup_polys = 1 + -(-LookupGate.num_slots_of(config)
                                     // lookup_degree)

        common = CommonCircuitData(
            config=config, spec=spec, fri_params=fri_params, gates=gates,
            selectors_info=selectors_info,
            quotient_degree_factor=quotient_degree_factor,
            num_gate_constraints=num_gate_constraints,
            num_constants=num_constants,
            num_public_inputs=num_public_inputs,
            k_is=k_is, num_partial_products=num_partial_products,
            num_lookup_polys=num_lookup_polys,
            num_lookup_selectors=num_lookup_selectors,
            luts=list(self.luts))

        prover_only = ProverOnlyCircuitData(
            generators=self.generators,
            generator_indices_by_watches=by_watches,
            constants_sigmas_commitment=constants_sigmas_commitment,
            sigmas=sigma_vecs,
            subgroup=subgroup,
            public_inputs=self.public_inputs,
            representative_map=forest.parents,
            circuit_digest=circuit_digest,
            random_wire=random_wire,
            lookup_rows=list(self.lookup_rows),
            lut_to_lookups=[list(v) for v in self.lut_to_lookups])

        verifier_only = VerifierOnlyCircuitData(
            constants_sigmas_cap=constants_sigmas_commitment.cap_host(),
            circuit_digest=circuit_digest)

        if self.goal_common_data is not None:
            # cyclic-recursion fixpoint (reference circuit_builder.rs:1332)
            assert common == self.goal_common_data, \
                "cyclic recursion: built common data != goal common data"

        return CircuitData(common=common, prover_only=prover_only,
                           verifier_only=verifier_only, F=self.F,
                           hasher=self.hasher,
                           inner_hasher=self.inner_hasher)

    def _num_blinding_gates(self, degree_estimate: int):
        """reference circuit_builder.rs:873-898."""
        D = self.spec.ext_degree
        degree_bits_estimate = host.log2_strict(degree_estimate)
        fri_queries = self.config.fri_config.num_query_rounds
        params = self.config.fri_config.fri_params(degree_bits_estimate,
                                                   True)
        arities = [1 << a for a in params.reduction_arity_bits]
        total_fold_points = sum(a - 1 for a in arities)
        prod = 1
        for a in arities:
            prod *= a
        final_poly_coeffs = degree_estimate // prod
        fri_openings = fri_queries * (1 + D * total_fold_points
                                      + D * final_poly_coeffs)
        return D + fri_openings, 2 * D + fri_openings

    def _blinding_counts(self):
        """reference circuit_builder.rs:903-922."""
        num_gates = len(self.gate_instances)
        degree_estimate = 1 << host.log2_ceil(max(num_gates, 2))
        while True:
            regular, z = self._num_blinding_gates(degree_estimate)
            if num_gates + regular + 2 * z <= degree_estimate:
                return regular, z
            degree_estimate *= 2

    def _blind(self):
        """zk blinding rows (reference circuit_builder.rs:924-980): one
        random row per regular opening; for each Z opening, two rows with
        copy-constrained random routed wires."""
        regular, z_openings = self._blinding_counts()
        p = self.spec.p
        for _ in range(regular):
            row = self.add_gate(NoopGate(), [])
            self.add_simple_generator(gen.RandomRowGenerator(
                row, range(self.config.num_wires), p))
        for _ in range(z_openings):
            row1 = self.add_gate(NoopGate(), [])
            row2 = self.add_gate(NoopGate(), [])
            self.add_simple_generator(gen.RandomRowGenerator(
                row1, range(self.config.num_routed_wires), p))
            for w in range(self.config.num_routed_wires):
                self.generate_copy(tgt.wire(row1, w), tgt.wire(row2, w))
                self.connect(tgt.wire(row1, w), tgt.wire(row2, w))

    def _digest_elements(self, digest) -> List[int]:
        """Digest -> field elements (bytes digests chunk per
        hash_types.rs:268-284; algebraic digests are already elements)."""
        if isinstance(digest, (bytes, bytearray)):
            chunk = 7 if self.spec.bits > 32 else 3
            return [int.from_bytes(digest[i:i + chunk], "little")
                    for i in range(0, len(digest), chunk)]
        return list(digest)

    def _hash_pad(self, inputs: List[int]) -> List[int]:
        """pad10*1 then hash (reference plonk/config.rs:58-66)."""
        padded = list(inputs) + [1]
        rate = self.hasher.RATE
        while (len(padded) + 1) % rate != 0:
            padded.append(0)
        padded.append(1)
        return self.hasher.hash_no_pad_host(padded)

    def _constant_polys(self, gates) -> List[np.ndarray]:
        max_constants = max(g.num_constants() for g in gates)
        mat = np.zeros((max_constants, len(self.gate_instances)),
                       dtype=np.uint64)
        for row, inst in enumerate(self.gate_instances):
            for i, c in enumerate(inst.constants):
                mat[i, row] = c
        return [mat[i] for i in range(max_constants)]

    def _sigma_vecs(self, k_is, subgroup):
        config = self.config
        degree = len(self.gate_instances)
        forest = Forest(config.num_wires, config.num_routed_wires, degree,
                        self.virtual_target_index)
        for a, b in self.copy_constraints:
            forest.merge(a, b)
        forest.compress_paths()
        wp = forest.wire_partition()
        return (wp.get_sigma_polys(host.log2_strict(degree), k_is, subgroup,
                                   self.spec.p), forest)
