"""RandomAccess / BaseSum / Exponentiation gates
(reference plonky2/src/gates/{random_access.rs, base_sum.rs,
exponentiation.rs}) — the index/decomposition toolbox the in-circuit FRI
verifier is built from.
"""

from __future__ import annotations

from typing import List

from ..field import host
from ..iop import generator as gen
from ..iop import target as tgt
from .base import EvaluationVars, Gate


class RandomAccessGate(Gate):
    """Checks claimed_element == list[access_index] via binary index
    decomposition and log-depth pair folding
    (reference random_access.rs:32-200)."""

    def __init__(self, bits: int, num_copies: int, num_extra_constants: int):
        self.bits = bits
        self.num_copies = num_copies
        # slot capacity for find_slot packing + unused-generator dropping
        self.num_ops = num_copies
        self.num_extra_constants = num_extra_constants

    @classmethod
    def from_config(cls, config, bits: int):
        vec_size = 1 << bits
        max_copies = min(config.num_routed_wires // (2 + vec_size),
                         config.num_wires // (2 + vec_size + bits))
        max_extra = config.num_routed_wires - (2 + vec_size) * max_copies
        return cls(bits, max_copies, min(max_extra, config.num_constants))

    def id(self):
        return (f"RandomAccessGate {{ bits: {self.bits}, num_copies: "
                f"{self.num_copies}, num_extra_constants: "
                f"{self.num_extra_constants} }}")

    @property
    def vec_size(self):
        return 1 << self.bits

    def wire_access_index(self, copy):
        return (2 + self.vec_size) * copy

    def wire_claimed_element(self, copy):
        return (2 + self.vec_size) * copy + 1

    def wire_list_item(self, i, copy):
        return (2 + self.vec_size) * copy + 2 + i

    def start_extra_constants(self):
        return (2 + self.vec_size) * self.num_copies

    def wire_extra_constant(self, i):
        return self.start_extra_constants() + i

    def num_routed(self):
        return self.start_extra_constants() + self.num_extra_constants

    def wire_bit(self, i, copy):
        return self.num_routed() + copy * self.bits + i

    def num_wires(self):
        return self.wire_bit(self.bits - 1, self.num_copies - 1) + 1

    def num_constants(self):
        return self.num_extra_constants

    def degree(self):
        return self.bits + 1

    def num_constraints(self):
        return self.num_copies * (self.bits + 2) + self.num_extra_constants

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        lw = vars.local_wires
        one = A.one()
        out = []
        for copy in range(self.num_copies):
            access_index = lw[self.wire_access_index(copy)]
            items = [lw[self.wire_list_item(i, copy)]
                     for i in range(self.vec_size)]
            claimed = lw[self.wire_claimed_element(copy)]
            bits = [lw[self.wire_bit(i, copy)] for i in range(self.bits)]
            for b in bits:
                out.append(A.mul(b, A.sub(b, one)))
            recon = A.zero()
            for b in reversed(bits):
                recon = A.add(A.add(recon, recon), b)
            out.append(A.sub(recon, access_index))
            for b in bits:
                items = [A.add(items[2 * i],
                               A.mul(b, A.sub(items[2 * i + 1],
                                              items[2 * i])))
                         for i in range(len(items) // 2)]
            out.append(A.sub(items[0], claimed))
        for i in range(self.num_extra_constants):
            out.append(A.sub(vars.local_constants[i],
                             lw[self.wire_extra_constant(i)]))
        return out

    def extra_constant_wires(self):
        # reference random_access.rs: leftover routed wires stash constants
        return [(i, self.wire_extra_constant(i))
                for i in range(self.num_extra_constants)]

    def generators(self, row, local_constants, spec):
        return [_RandomAccessGenerator(self, row, copy)
                for copy in range(self.num_copies)]


class _RandomAccessGenerator(gen.SimpleGenerator):
    def __init__(self, gate, row, copy):
        self.gate, self.row, self.copy = gate, row, copy

    def dependencies(self):
        g, c = self.gate, self.copy
        return ([tgt.wire(self.row, g.wire_access_index(c))]
                + [tgt.wire(self.row, g.wire_list_item(i, c))
                   for i in range(g.vec_size)])

    def run_once(self, witness, out):
        g, c = self.gate, self.copy
        idx = witness.get_target(tgt.wire(self.row, g.wire_access_index(c)))
        assert idx < g.vec_size, f"access index {idx} >= {g.vec_size}"
        out.append((tgt.wire(self.row, g.wire_claimed_element(c)),
                    witness.get_target(
                        tgt.wire(self.row, g.wire_list_item(idx, c)))))
        for i in range(g.bits):
            out.append((tgt.wire(self.row, g.wire_bit(i, c)),
                        (idx >> i) & 1))


class BaseSumGate(Gate):
    """sum = sum_i limb_i B^i with limbs range-checked in [0, B)
    (reference base_sum.rs:25-150).  Wire 0 = sum; wires 1.. = limbs."""

    WIRE_SUM = 0
    START_LIMBS = 1

    def __init__(self, num_limbs: int, base: int):
        self.num_limbs = num_limbs
        self.base = base

    @classmethod
    def from_config(cls, config, spec, base: int):
        # log_floor(p-1, base)
        n, v = 0, spec.p - 1
        while v >= base:
            v //= base
            n += 1
        return cls(min(n, config.num_routed_wires - cls.START_LIMBS), base)

    def id(self):
        return (f"BaseSumGate {{ num_limbs: {self.num_limbs} }} + Base: "
                f"{self.base}")

    def limbs(self):
        return range(self.START_LIMBS, self.START_LIMBS + self.num_limbs)

    def num_wires(self):
        return 1 + self.num_limbs

    def num_constants(self):
        return 0

    def degree(self):
        return self.base

    def num_constraints(self):
        return 1 + self.num_limbs

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        s = vars.local_wires[self.WIRE_SUM]
        limbs = [vars.local_wires[i] for i in self.limbs()]
        computed = A.zero()
        for limb in reversed(limbs):
            computed = A.add(A.mul_base_const(computed, self.base), limb)
        out = [A.sub(computed, s)]
        for limb in limbs:
            acc = None
            for i in range(self.base):
                term = A.add_base_const(limb, (-i) % A.spec.p)
                acc = term if acc is None else A.mul(acc, term)
            out.append(acc)
        return out

    def generators(self, row, local_constants, spec):
        return [_BaseSplitGenerator(self, row)]


class _BaseSplitGenerator(gen.SimpleGenerator):
    def __init__(self, gate, row):
        self.gate, self.row = gate, row

    def dependencies(self):
        return [tgt.wire(self.row, BaseSumGate.WIRE_SUM)]

    def run_once(self, witness, out):
        g = self.gate
        v = witness.get_target(tgt.wire(self.row, BaseSumGate.WIRE_SUM))
        for i in g.limbs():
            out.append((tgt.wire(self.row, i), v % g.base))
            v //= g.base
        assert v == 0, "sum does not fit in limbs"


class ExponentiationGate(Gate):
    """x^e with bit-decomposed exponent (reference exponentiation.rs:31-160).
    Wires: base, power bits (LE), output, intermediates."""

    def __init__(self, num_power_bits: int):
        self.num_power_bits = num_power_bits

    @classmethod
    def from_config(cls, config):
        return cls(min(config.num_routed_wires - 2,
                       (config.num_wires - 2) // 2))

    def id(self):
        return (f"ExponentiationGate {{ num_power_bits: "
                f"{self.num_power_bits}, _phantom: PhantomData<"
                f"plonky2_field::goldilocks_field::GoldilocksField> }}<D=2>")

    def wire_base(self):
        return 0

    def wire_power_bit(self, i):
        return 1 + i

    def wire_output(self):
        return 1 + self.num_power_bits

    def wire_intermediate_value(self, i):
        return 2 + self.num_power_bits + i

    def num_wires(self):
        return 2 + 2 * self.num_power_bits

    def num_constants(self):
        return 0

    def degree(self):
        return 4

    def num_constraints(self):
        return self.num_power_bits + 1

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        lw = vars.local_wires
        base = lw[self.wire_base()]
        nb = self.num_power_bits
        bits = [lw[self.wire_power_bit(i)] for i in range(nb)]
        inter = [lw[self.wire_intermediate_value(i)] for i in range(nb)]
        output = lw[self.wire_output()]
        one = A.one()
        out = []
        for i in range(nb):
            prev = one if i == 0 else A.mul(inter[i - 1], inter[i - 1])
            cur_bit = bits[nb - i - 1]
            not_bit = A.sub(one, cur_bit)
            computed = A.mul(prev, A.add(A.mul(cur_bit, base), not_bit))
            out.append(A.sub(computed, inter[i]))
        out.append(A.sub(output, inter[nb - 1]))
        return out

    def generators(self, row, local_constants, spec):
        return [_ExponentiationGenerator(self, row, spec)]


class _ExponentiationGenerator(gen.SimpleGenerator):
    def __init__(self, gate, row, spec):
        self.gate, self.row, self.spec = gate, row, spec

    def dependencies(self):
        g = self.gate
        return ([tgt.wire(self.row, g.wire_base())]
                + [tgt.wire(self.row, g.wire_power_bit(i))
                   for i in range(g.num_power_bits)])

    def run_once(self, witness, out):
        g = self.gate
        p = self.spec.p
        base = witness.get_target(tgt.wire(self.row, g.wire_base()))
        nb = g.num_power_bits
        bits = [witness.get_target(tgt.wire(self.row, g.wire_power_bit(i)))
                for i in range(nb)]
        inter = 1
        for i in range(nb):
            prev = inter if i == 0 else inter * inter % p
            cur_bit = bits[nb - i - 1]
            inter = prev * (cur_bit * base + (1 - cur_bit)) % p
            out.append((tgt.wire(self.row, g.wire_intermediate_value(i)),
                        inter))
        out.append((tgt.wire(self.row, g.wire_output()), inter))
