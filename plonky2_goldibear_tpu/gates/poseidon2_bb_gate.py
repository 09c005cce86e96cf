"""Poseidon2BabyBearGate: width-16 Poseidon2 permutation(s) in one row with
a conditional-swap flag (reference plonky2/src/gates/poseidon2_babybear.rs).

Per op: 33 routed wires (16 in + 16 out + swap) and 133 non-routed witness
wires (8 swap deltas + 16x7 full-round S-box inputs + 13 partial-round S-box
inputs).  The BB-narrow config (167 wires) fits exactly one op.
"""

from __future__ import annotations

from typing import List

from ..field import host
from ..hash import _poseidon2_bb_constants as C
from ..hash import poseidon2_bb as p2
from ..iop import generator as gen
from ..iop import target as tgt
from .base import EvaluationVars, Gate, HostBaseAlgebra

W = C.SPONGE_WIDTH            # 16
CAP = C.SPONGE_CAPACITY       # 8
HALF = C.HALF_N_FULL_ROUNDS   # 4
NP = C.N_PARTIAL_ROUNDS       # 13
ROUTED_PER_OP = 2 * W + 1
NON_ROUTED_PER_OP = CAP + W * (C.N_FULL_ROUNDS_TOTAL - 1) + NP


class Poseidon2BabyBearGate(Gate):
    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @classmethod
    def from_config(cls, config):
        per_op = ROUTED_PER_OP + NON_ROUTED_PER_OP
        return cls(min(config.num_wires // per_op,
                       config.num_routed_wires // ROUTED_PER_OP))

    def id(self):
        return (f"Poseidon2BabyBearGate {{ num_ops: {self.num_ops}, "
                f"_phantom: PhantomData<p3_baby_bear::baby_bear::BabyBear> "
                f"}}<WIDTH={W}>")

    # routed
    def wire_input(self, op, i):
        return ROUTED_PER_OP * op + i

    def wire_output(self, op, i):
        return ROUTED_PER_OP * op + W + i

    def wire_swap(self, op):
        return ROUTED_PER_OP * op + 2 * W

    # non-routed
    def _start_delta(self, op):
        return self.num_ops * ROUTED_PER_OP + op * NON_ROUTED_PER_OP

    def wire_delta(self, op, i):
        return self._start_delta(op) + i

    def _start_full_0(self, op):
        return self._start_delta(op) + CAP

    def wire_full_sbox_0(self, op, round_, i):
        assert 0 < round_ < HALF
        return self._start_full_0(op) + W * (round_ - 1) + i

    def _start_partial(self, op):
        return self._start_full_0(op) + W * (HALF - 1)

    def wire_partial_sbox(self, op, round_):
        return self._start_partial(op) + round_

    def _start_full_1(self, op):
        return self._start_partial(op) + NP

    def wire_full_sbox_1(self, op, round_, i):
        return self._start_full_1(op) + W * round_ + i

    def num_wires(self):
        return self.num_ops * (ROUTED_PER_OP + NON_ROUTED_PER_OP)

    def num_constants(self):
        return 0

    def degree(self):
        return 7

    def num_constraints(self):
        return self.num_ops * (1 + CAP + W * (C.N_FULL_ROUNDS_TOTAL - 1)
                               + NP + W)

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        lw = vars.local_wires
        one = A.one()
        constraints = []
        for op in range(self.num_ops):
            swap = lw[self.wire_swap(op)]
            constraints.append(A.mul(swap, A.sub(swap, one)))
            for i in range(CAP):
                lhs = lw[self.wire_input(op, i)]
                rhs = lw[self.wire_input(op, i + CAP)]
                delta = lw[self.wire_delta(op, i)]
                constraints.append(
                    A.sub(A.mul(swap, A.sub(rhs, lhs)), delta))
            state = [None] * W
            for i in range(CAP):
                delta = lw[self.wire_delta(op, i)]
                state[i] = A.add(lw[self.wire_input(op, i)], delta)
                state[i + CAP] = A.sub(lw[self.wire_input(op, i + CAP)],
                                       delta)

            state = p2.external_layer_a(A, state)
            for r in range(HALF):
                state = [A.add_base_const(x, c)
                         for x, c in zip(state, C.EXTERNAL_CONSTANTS[r])]
                if r > 0:
                    for i in range(W):
                        sbox_in = lw[self.wire_full_sbox_0(op, r, i)]
                        constraints.append(A.sub(state[i], sbox_in))
                        state[i] = sbox_in
                state = [p2.sbox_a(A, x) for x in state]
                state = p2.external_layer_a(A, state)
            for r in range(NP):
                state[0] = A.add_base_const(state[0],
                                            C.INTERNAL_CONSTANTS[r])
                sbox_in = lw[self.wire_partial_sbox(op, r)]
                constraints.append(A.sub(state[0], sbox_in))
                state[0] = p2.sbox_a(A, sbox_in)
                state = p2.internal_layer_a(A, state)
            for r in range(HALF, C.N_FULL_ROUNDS_TOTAL):
                state = [A.add_base_const(x, c)
                         for x, c in zip(state, C.EXTERNAL_CONSTANTS[r])]
                for i in range(W):
                    sbox_in = lw[self.wire_full_sbox_1(op, r - HALF, i)]
                    constraints.append(A.sub(state[i], sbox_in))
                    state[i] = sbox_in
                state = [p2.sbox_a(A, x) for x in state]
                state = p2.external_layer_a(A, state)
            for i in range(W):
                constraints.append(A.sub(state[i],
                                         lw[self.wire_output(op, i)]))
        return constraints

    def generators(self, row, local_constants, spec):
        return [_Poseidon2Generator(self, row, op, spec)
                for op in range(self.num_ops)]

    def complete_wires(self, builder, gate_idx, slot_idx) -> bool:
        """Route zeros into unused ops so their (retained) generators run
        (reference poseidon2_babybear.rs:175-205)."""
        zero = builder.zero()
        completed = slot_idx < self.num_ops
        while slot_idx < self.num_ops:
            builder.connect(zero, tgt.wire(gate_idx,
                                           self.wire_swap(slot_idx)))
            for i in range(W):
                builder.connect(zero, tgt.wire(
                    gate_idx, self.wire_input(slot_idx, i)))
            slot_idx += 1
        return completed


class _Poseidon2Generator(gen.SimpleGenerator):
    def __init__(self, gate, row, op, spec):
        self.gate, self.row, self.op, self.spec = gate, row, op, spec

    def dependencies(self):
        g, op = self.gate, self.op
        return [tgt.wire(self.row, g.wire_input(op, i)) for i in range(W)] \
            + [tgt.wire(self.row, g.wire_swap(op))]

    def run_once(self, witness, out):
        g, op = self.gate, self.op
        A = HostBaseAlgebra(self.spec)
        p = self.spec.p
        wv = [witness.get_target(tgt.wire(self.row, g.wire_input(op, i)))
              for i in range(W)]
        swap = witness.get_target(tgt.wire(self.row, g.wire_swap(op)))
        assert swap in (0, 1)
        for i in range(CAP):
            delta = swap * (wv[i + CAP] - wv[i]) % p
            out.append((tgt.wire(self.row, g.wire_delta(op, i)), delta))
        state = list(wv)
        if swap == 1:
            for i in range(CAP):
                state[i], state[i + CAP] = state[i + CAP], state[i]

        state = p2.external_layer_a(A, state)
        for r in range(HALF):
            state = [A.add_base_const(x, c)
                     for x, c in zip(state, C.EXTERNAL_CONSTANTS[r])]
            if r > 0:
                for i in range(W):
                    out.append((tgt.wire(self.row,
                                         g.wire_full_sbox_0(op, r, i)),
                                state[i]))
            state = [p2.sbox_a(A, x) for x in state]
            state = p2.external_layer_a(A, state)
        for r in range(NP):
            state[0] = A.add_base_const(state[0], C.INTERNAL_CONSTANTS[r])
            out.append((tgt.wire(self.row, g.wire_partial_sbox(op, r)),
                        state[0]))
            state[0] = p2.sbox_a(A, state[0])
            state = p2.internal_layer_a(A, state)
        for r in range(HALF, C.N_FULL_ROUNDS_TOTAL):
            state = [A.add_base_const(x, c)
                     for x, c in zip(state, C.EXTERNAL_CONSTANTS[r])]
            for i in range(W):
                out.append((tgt.wire(self.row,
                                     g.wire_full_sbox_1(op, r - HALF, i)),
                            state[i]))
            state = [p2.sbox_a(A, x) for x in state]
            state = p2.external_layer_a(A, state)
        for i in range(W):
            out.append((tgt.wire(self.row, g.wire_output(op, i)), state[i]))
