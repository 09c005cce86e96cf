"""Poseidon2R0BabyBearGate: width-24 risc0-Poseidon2 permutation(s) in one
row with a conditional-swap flag (reference
plonky2/src/gates/poseidon2_risc0_babybear.rs:38-492).

Per op: 49 routed wires (24 in + 24 out + swap) and 197 non-routed witness
wires (8 swap deltas + 24x7 full-round S-box inputs + 21 partial-round S-box
inputs).  Same wire/constraint scheme as Poseidon2BabyBearGate, with the
risc0 round functions (HL external matrix, diagonal internal layer).
"""

from __future__ import annotations

from typing import List

from ..hash import _poseidon2_r0_bb_constants as C
from ..hash import poseidon2_r0_bb as r0
from ..iop import generator as gen
from ..iop import target as tgt
from .base import EvaluationVars, Gate, HostBaseAlgebra

W = C.SPONGE_WIDTH            # 24
CAP = C.SPONGE_CAPACITY       # 8
HALF = C.HALF_N_FULL_ROUNDS   # 4
NP = C.N_PARTIAL_ROUNDS       # 21
ROUTED_PER_OP = 2 * W + 1
NON_ROUTED_PER_OP = CAP + W * (C.N_FULL_ROUNDS_TOTAL - 1) + NP


class Poseidon2R0BabyBearGate(Gate):
    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @classmethod
    def from_config(cls, config):
        per_op = ROUTED_PER_OP + NON_ROUTED_PER_OP
        return cls(min(config.num_wires // per_op,
                       config.num_routed_wires // ROUTED_PER_OP))

    def id(self):
        return (f"Poseidon2R0BabyBearGate {{ num_ops: {self.num_ops}, "
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
            for i in range(2 * CAP, W):
                state[i] = lw[self.wire_input(op, i)]

            state = r0.external_layer_a(A, state)
            for r in range(HALF):
                state = [A.add_base_const(x, c)
                         for x, c in zip(state, C.EXTERNAL_CONSTANTS[r])]
                if r > 0:
                    for i in range(W):
                        sbox_in = lw[self.wire_full_sbox_0(op, r, i)]
                        constraints.append(A.sub(state[i], sbox_in))
                        state[i] = sbox_in
                state = [r0.sbox_a(A, x) for x in state]
                state = r0.external_layer_a(A, state)
            for r in range(NP):
                state[0] = A.add_base_const(state[0],
                                            C.INTERNAL_CONSTANTS[r])
                sbox_in = lw[self.wire_partial_sbox(op, r)]
                constraints.append(A.sub(state[0], sbox_in))
                state[0] = r0.sbox_a(A, sbox_in)
                state = r0.internal_layer_a(A, state)
            for r in range(HALF, C.N_FULL_ROUNDS_TOTAL):
                state = [A.add_base_const(x, c)
                         for x, c in zip(state, C.EXTERNAL_CONSTANTS[r])]
                for i in range(W):
                    sbox_in = lw[self.wire_full_sbox_1(op, r - HALF, i)]
                    constraints.append(A.sub(state[i], sbox_in))
                    state[i] = sbox_in
                state = [r0.sbox_a(A, x) for x in state]
                state = r0.external_layer_a(A, state)
            for i in range(W):
                constraints.append(A.sub(state[i],
                                         lw[self.wire_output(op, i)]))
        return constraints

    def eval_unfiltered_device(self, F, stacked_wires, vars) -> List:
        """Scan/stacked formulation of eval_unfiltered for the batched
        prover (same values, same order; compact XLA graph)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        assert F.SPEC.name == "babybear"

        def consts(vals):
            return F.from_ints(np.array(vals, dtype=np.uint64))

        # HL M4 (reference apply_hl_mat4): rows of the 4x4 matrix
        m4 = consts([[5, 7, 1, 3], [4, 6, 1, 1],
                     [1, 3, 5, 7], [1, 1, 4, 6]])
        diag = consts(C.M_INT_DIAG_HZN)                  # (24,)
        ext_c = consts(C.EXTERNAL_CONSTANTS)             # (8, 24)
        int_c = consts(C.INTERNAL_CONSTANTS)             # (21,)

        def sbox(x):
            x2 = F.mul(x, x)
            return F.mul(F.mul(x2, x), F.mul(x2, x2))

        def external(st):
            blocks = st.reshape(W // 4, 4, -1)
            y = F.batch_sum(F.mul(blocks[:, None, :, :],
                                  m4[None, :, :, None]), axis=2)
            sums = F.batch_sum(y, axis=0)
            return F.add(y, sums[None]).reshape(W, -1)

        def internal(st):
            total = F.batch_sum(st, axis=0)
            return F.add(total[None], F.mul(st, diag[:, None]))

        constraints: List = []
        one = F.ones(())
        for op in range(self.num_ops):
            inputs = stacked_wires[self.wire_input(op, 0):
                                   self.wire_input(op, 0) + W]
            outputs = stacked_wires[self.wire_output(op, 0):
                                    self.wire_output(op, 0) + W]
            swap = stacked_wires[self.wire_swap(op)]
            d0 = self._start_delta(op)
            deltas = stacked_wires[d0:d0 + CAP]
            full0_w = stacked_wires[self._start_full_0(op):
                                    self._start_partial(op)]
            full0_w = full0_w.reshape(HALF - 1, W, -1)
            partial_w = stacked_wires[self._start_partial(op):
                                      self._start_full_1(op)]
            full1_w = stacked_wires[self._start_full_1(op):
                                    self._start_full_1(op) + W * HALF]
            full1_w = full1_w.reshape(HALF, W, -1)

            constraints.append(F.mul(swap, F.sub(swap, one)))
            lhs, rhs = inputs[:CAP], inputs[CAP:2 * CAP]
            delta_c = F.sub(F.mul(swap[None], F.sub(rhs, lhs)), deltas)
            constraints.extend(delta_c[i] for i in range(CAP))

            state = jnp.concatenate([F.add(lhs, deltas),
                                     F.sub(rhs, deltas),
                                     inputs[2 * CAP:]], axis=0)
            state = external(state)
            state = external(sbox(F.add(state, ext_c[0][:, None])))

            def full_step(st, xs):
                rc_r, wires_r = xs
                cons = F.sub(F.add(st, rc_r[:, None]), wires_r)
                return external(sbox(wires_r)), cons

            state, cons0 = jax.lax.scan(full_step, state,
                                        (ext_c[1:HALF], full0_w))
            constraints.extend(cons0[r, i] for r in range(HALF - 1)
                               for i in range(W))

            def partial_step(st, xs):
                rc_r, wire_r = xs
                cons = F.sub(F.add(st[0], rc_r), wire_r)
                st = jnp.concatenate([sbox(wire_r)[None], st[1:]], axis=0)
                return internal(st), cons

            state, consp = jax.lax.scan(partial_step, state,
                                        (int_c, partial_w))
            constraints.extend(consp[r] for r in range(NP))

            state, cons1 = jax.lax.scan(full_step, state,
                                        (ext_c[HALF:], full1_w))
            constraints.extend(cons1[r, i] for r in range(HALF)
                               for i in range(W))

            out_c = F.sub(state, outputs)
            constraints.extend(out_c[i] for i in range(W))
        return constraints

    def generators(self, row, local_constants, spec):
        return [_Poseidon2R0Generator(self, row, op, spec)
                for op in range(self.num_ops)]

    def complete_wires(self, builder, gate_idx, slot_idx) -> bool:
        """reference poseidon2_risc0_babybear.rs:166-197."""
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


class _Poseidon2R0Generator(gen.SimpleGenerator):
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

        state = r0.external_layer_a(A, state)
        for r in range(HALF):
            state = [A.add_base_const(x, c)
                     for x, c in zip(state, C.EXTERNAL_CONSTANTS[r])]
            if r > 0:
                for i in range(W):
                    out.append((tgt.wire(self.row,
                                         g.wire_full_sbox_0(op, r, i)),
                                state[i]))
            state = [r0.sbox_a(A, x) for x in state]
            state = r0.external_layer_a(A, state)
        for r in range(NP):
            state[0] = A.add_base_const(state[0], C.INTERNAL_CONSTANTS[r])
            out.append((tgt.wire(self.row, g.wire_partial_sbox(op, r)),
                        state[0]))
            state[0] = r0.sbox_a(A, state[0])
            state = r0.internal_layer_a(A, state)
        for r in range(HALF, C.N_FULL_ROUNDS_TOTAL):
            state = [A.add_base_const(x, c)
                     for x, c in zip(state, C.EXTERNAL_CONSTANTS[r])]
            for i in range(W):
                out.append((tgt.wire(self.row,
                                     g.wire_full_sbox_1(op, r - HALF, i)),
                            state[i]))
            state = [r0.sbox_a(A, x) for x in state]
            state = r0.external_layer_a(A, state)
        for i in range(W):
            out.append((tgt.wire(self.row, g.wire_output(op, i)), state[i]))
