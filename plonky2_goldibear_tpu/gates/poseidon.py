"""PoseidonGate: a full width-12 Poseidon permutation in one row, with a
conditional-swap flag for Merkle-path ordering
(reference plonky2/src/gates/poseidon_goldilocks.rs).

Wire layout (reference :44-103): 12 inputs, 12 outputs, swap flag, 4 swap
deltas, then the S-box inputs of every round after the first full round —
12*(HALF_FULL-1) + N_PARTIAL + 12*HALF_FULL non-routed witness wires.  The
constraints re-run the permutation between stored S-box inputs, using the
fast partial-round schedule (hash/poseidon_gl.py permute_fast_a pieces).
"""

from __future__ import annotations

from typing import List

from ..field import host
from ..hash import _poseidon_gl_constants as C
from ..hash import poseidon_gl as pg
from ..iop import generator as gen
from ..iop import target as tgt
from .base import EvaluationVars, Gate, HostBaseAlgebra

W = C.SPONGE_WIDTH
HALF = C.HALF_N_FULL_ROUNDS
NP = C.N_PARTIAL_ROUNDS


class PoseidonGate(Gate):
    WIRE_SWAP = 2 * W
    _START_DELTA = 2 * W + 1
    _START_FULL_0 = _START_DELTA + 4
    _START_PARTIAL = _START_FULL_0 + W * (HALF - 1)
    _START_FULL_1 = _START_PARTIAL + NP

    @staticmethod
    def wire_input(i):
        return i

    @staticmethod
    def wire_output(i):
        return W + i

    @classmethod
    def wire_delta(cls, i):
        assert i < 4
        return cls._START_DELTA + i

    @classmethod
    def wire_full_sbox_0(cls, round_, i):
        assert 0 < round_ < HALF
        return cls._START_FULL_0 + W * (round_ - 1) + i

    @classmethod
    def wire_partial_sbox(cls, round_):
        assert round_ < NP
        return cls._START_PARTIAL + round_

    @classmethod
    def wire_full_sbox_1(cls, round_, i):
        assert round_ < HALF
        return cls._START_FULL_1 + W * round_ + i

    @classmethod
    def end(cls):
        return cls._START_FULL_1 + W * HALF

    def id(self):
        # reference format: "PoseidonGate(PhantomData<...>)<WIDTH=12>"; keep
        # the distinguishing tail
        return f"PoseidonGate<WIDTH={W}>"

    def num_wires(self):
        return self.end()

    def num_constants(self):
        return 0

    def degree(self):
        return 7

    def num_constraints(self):
        return W * (2 * HALF - 1) + NP + W + 1 + 4

    def eval_unfiltered(self, A, vars: EvaluationVars) -> List:
        constraints = []
        lw = vars.local_wires
        one = A.one()

        swap = lw[self.WIRE_SWAP]
        constraints.append(A.mul(swap, A.sub(swap, one)))

        for i in range(4):
            lhs = lw[self.wire_input(i)]
            rhs = lw[self.wire_input(i + 4)]
            delta = lw[self.wire_delta(i)]
            constraints.append(A.sub(A.mul(swap, A.sub(rhs, lhs)), delta))

        state = [None] * W
        for i in range(4):
            delta = lw[self.wire_delta(i)]
            state[i] = A.add(lw[self.wire_input(i)], delta)
            state[i + 4] = A.sub(lw[self.wire_input(i + 4)], delta)
        for i in range(8, W):
            state[i] = lw[self.wire_input(i)]

        round_ctr = 0
        for r in range(HALF):
            state = pg.constant_layer_a(A, state, round_ctr)
            if r != 0:
                for i in range(W):
                    sbox_in = lw[self.wire_full_sbox_0(r, i)]
                    constraints.append(A.sub(state[i], sbox_in))
                    state[i] = sbox_in
            state = pg.sbox_layer_a(A, state)
            state = pg.mds_layer_a(A, state)
            round_ctr += 1

        state = pg.partial_first_constant_layer_a(A, state)
        state = pg.mds_partial_layer_init_a(A, state)
        for r in range(NP - 1):
            sbox_in = lw[self.wire_partial_sbox(r)]
            constraints.append(A.sub(state[0], sbox_in))
            state[0] = pg.sbox_monomial_a(A, sbox_in)
            state[0] = A.add_base_const(state[0],
                                        C.FAST_PARTIAL_ROUND_CONSTANTS[r])
            state = pg.mds_partial_layer_fast_a(A, state, r)
        sbox_in = lw[self.wire_partial_sbox(NP - 1)]
        constraints.append(A.sub(state[0], sbox_in))
        state[0] = pg.sbox_monomial_a(A, sbox_in)
        state = pg.mds_partial_layer_fast_a(A, state, NP - 1)
        round_ctr += NP

        for r in range(HALF):
            state = pg.constant_layer_a(A, state, round_ctr)
            for i in range(W):
                sbox_in = lw[self.wire_full_sbox_1(r, i)]
                constraints.append(A.sub(state[i], sbox_in))
                state[i] = sbox_in
            state = pg.sbox_layer_a(A, state)
            state = pg.mds_layer_a(A, state)
            round_ctr += 1

        for i in range(W):
            constraints.append(A.sub(state[i], lw[self.wire_output(i)]))

        return constraints

    def generators(self, row, local_constants, spec):
        return [PoseidonGenerator(row, spec)]


class PoseidonGenerator(gen.SimpleGenerator):
    """Fills deltas, per-round S-box inputs and outputs
    (reference gates/poseidon_goldilocks.rs:438-533)."""

    def __init__(self, row: int, spec: host.FieldSpec):
        self.row = row
        self.spec = spec

    def dependencies(self):
        g = PoseidonGate
        return [tgt.wire(self.row, g.wire_input(i)) for i in range(W)] + \
            [tgt.wire(self.row, g.WIRE_SWAP)]

    def run_once(self, witness, out):
        g = PoseidonGate
        A = HostBaseAlgebra(self.spec)
        wv = [witness.get_target(tgt.wire(self.row, g.wire_input(i)))
              for i in range(W)]
        swap = witness.get_target(tgt.wire(self.row, g.WIRE_SWAP))
        assert swap in (0, 1), swap

        p = self.spec.p
        for i in range(4):
            delta = swap * (wv[i + 4] - wv[i]) % p
            out.append((tgt.wire(self.row, g.wire_delta(i)), delta))
        state = list(wv)
        if swap == 1:
            for i in range(4):
                state[i], state[i + 4] = state[i + 4], state[i]

        round_ctr = 0
        for r in range(HALF):
            state = pg.constant_layer_a(A, state, round_ctr)
            if r != 0:
                for i in range(W):
                    out.append((tgt.wire(self.row, g.wire_full_sbox_0(r, i)),
                                state[i]))
            state = pg.sbox_layer_a(A, state)
            state = pg.mds_layer_a(A, state)
            round_ctr += 1

        state = pg.partial_first_constant_layer_a(A, state)
        state = pg.mds_partial_layer_init_a(A, state)
        for r in range(NP - 1):
            out.append((tgt.wire(self.row, g.wire_partial_sbox(r)), state[0]))
            state[0] = pg.sbox_monomial_a(A, state[0])
            state[0] = A.add_base_const(state[0],
                                        C.FAST_PARTIAL_ROUND_CONSTANTS[r])
            state = pg.mds_partial_layer_fast_a(A, state, r)
        out.append((tgt.wire(self.row, g.wire_partial_sbox(NP - 1)),
                    state[0]))
        state[0] = pg.sbox_monomial_a(A, state[0])
        state = pg.mds_partial_layer_fast_a(A, state, NP - 1)
        round_ctr += NP

        for r in range(HALF):
            state = pg.constant_layer_a(A, state, round_ctr)
            for i in range(W):
                out.append((tgt.wire(self.row, g.wire_full_sbox_1(r, i)),
                            state[i]))
            state = pg.sbox_layer_a(A, state)
            state = pg.mds_layer_a(A, state)
            round_ctr += 1

        for i in range(W):
            out.append((tgt.wire(self.row, g.wire_output(i)), state[i]))
