"""Lookup gates (reference plonky2/src/gates/{lookup.rs, lookup_table.rs}).

``LookupGate`` stores (input, output) looking pairs; ``LookupTableGate``
stores the table entries plus multiplicities.  Neither imposes constraints
itself — the logUp argument lives in the lookup polynomials checked by
``plonk/vanishing.py`` (check_lookup_constraints).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..iop import generator as gen
from ..iop import target as tgt
from ..utils.keccak import keccak256
from .base import Gate

LookupTable = Tuple[Tuple[int, int], ...]   # ((input, output), ...) u16s


def lut_hash(lut: LookupTable) -> bytes:
    data = b"".join(inp.to_bytes(2, "little") + out.to_bytes(2, "little")
                    for inp, out in lut)
    return keccak256(data)


def _hash_repr(h: bytes) -> str:
    # match the Rust Debug format for [u8; 32]
    return "[" + ", ".join(str(b) for b in h) + "]"


class LookupGate(Gate):
    """Looking pairs; 2 routed wires per slot (reference lookup.rs:33-70)."""

    def __init__(self, num_slots: int, lut: LookupTable):
        self.num_slots = num_slots
        self.num_ops = num_slots
        self.lut = tuple(tuple(x) for x in lut)
        self.lut_hash = lut_hash(self.lut)

    @classmethod
    def from_config(cls, config, lut):
        return cls(config.num_routed_wires // 2, lut)

    @staticmethod
    def num_slots_of(config):
        return config.num_routed_wires // 2

    def id(self):
        return (f"LookupGate {{num_slots: {self.num_slots}, lut_hash: "
                f"{_hash_repr(self.lut_hash)}}}")

    @staticmethod
    def wire_ith_looking_inp(i):
        return 2 * i

    @staticmethod
    def wire_ith_looking_out(i):
        return 2 * i + 1

    def num_wires(self):
        return 2 * self.num_slots

    def num_constants(self):
        return 0

    def degree(self):
        return 0

    def num_constraints(self):
        return 0

    def eval_unfiltered(self, A, vars):
        return []

    def generators(self, row, local_constants, spec):
        return [_LookupGenerator(row, self.lut, i)
                for i in range(self.num_slots)]


class _LookupGenerator(gen.SimpleGenerator):
    def __init__(self, row, lut, slot):
        self.row, self.lut, self.slot = row, lut, slot

    def dependencies(self):
        return [tgt.wire(self.row, LookupGate.wire_ith_looking_inp(self.slot))]

    def run_once(self, witness, out):
        inp = witness.get_target(
            tgt.wire(self.row, LookupGate.wire_ith_looking_inp(self.slot)))
        # fast path: table indexed by input value (reference lookup.rs:211)
        if inp < len(self.lut) and self.lut[inp][0] == inp:
            outv = self.lut[inp][1]
        else:
            for tin, tout in self.lut:
                if tin == inp:
                    outv = tout
                    break
            else:
                raise AssertionError("Incorrect input value provided")
        out.append((tgt.wire(self.row,
                             LookupGate.wire_ith_looking_out(self.slot)),
                    outv))


class LookupTableGate(Gate):
    """Table entries + multiplicities; 3 routed wires per slot
    (reference lookup_table.rs:37-85)."""

    def __init__(self, num_slots: int, lut: LookupTable, last_lut_row: int):
        self.num_slots = num_slots
        self.num_ops = num_slots
        self.lut = tuple(tuple(x) for x in lut)
        self.lut_hash = lut_hash(self.lut)
        self.last_lut_row = last_lut_row

    @staticmethod
    def num_slots_of(config):
        return config.num_routed_wires // 3

    def id(self):
        return (f"LookupTableGate {{num_slots: {self.num_slots}, lut_hash: "
                f"{_hash_repr(self.lut_hash)}, last_lut_row: "
                f"{self.last_lut_row}}}")

    @staticmethod
    def wire_ith_looked_inp(i):
        return 3 * i

    @staticmethod
    def wire_ith_looked_out(i):
        return 3 * i + 1

    @staticmethod
    def wire_ith_multiplicity(i):
        return 3 * i + 2

    def num_wires(self):
        return 3 * self.num_slots

    def num_constants(self):
        return 0

    def degree(self):
        return 0

    def num_constraints(self):
        return 0

    def eval_unfiltered(self, A, vars):
        return []

    def generators(self, row, local_constants, spec):
        return [_LookupTableGenerator(row, self.lut, i, self.num_slots,
                                      self.last_lut_row)
                for i in range(self.num_slots)]


class _LookupTableGenerator(gen.SimpleGenerator):
    def __init__(self, row, lut, slot, num_slots, last_lut_row):
        self.row, self.lut, self.slot = row, lut, slot
        self.num_slots, self.last_lut_row = num_slots, last_lut_row

    def dependencies(self):
        return []

    def run_once(self, witness, out):
        first_row = self.last_lut_row + \
            -(-len(self.lut) // self.num_slots) - 1
        slot = (first_row - self.row) * self.num_slots + self.slot
        inp_t = tgt.wire(self.row,
                         LookupTableGate.wire_ith_looked_inp(self.slot))
        out_t = tgt.wire(self.row,
                         LookupTableGate.wire_ith_looked_out(self.slot))
        if slot < len(self.lut):
            inp, outv = self.lut[slot]
            out.append((inp_t, inp))
            out.append((out_t, outv))
        else:
            out.append((inp_t, 0))
            out.append((out_t, 0))
