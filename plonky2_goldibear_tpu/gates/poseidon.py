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

# MDS transposed for out[c] = sum_r s[r] * M[r][c] broadcast-reduction:
# M[r][c] = CIRC[(r - c) % 12] + (r == c) * DIAG[r]
_MDS_FULL = [[C.MDS_MATRIX_CIRC[(r - c) % W] + (C.MDS_MATRIX_DIAG[r]
                                                if r == c else 0)
              for c in range(W)] for r in range(W)]

# init-layer matrix, same orientation: result[0]=state[0],
# result[c>=1] = sum_{r>=1} state[r] * INIT[r-1][c-1]
_INIT_FULL = [[1 if (r == 0 and c == 0) else
               (0 if (r == 0 or c == 0) else
                C.FAST_PARTIAL_ROUND_INITIAL_MATRIX[r - 1][c - 1])
               for c in range(W)] for r in range(W)]


def _sbox_cols(F, state):
    x2 = F.sqr(state)
    x3 = F.mul(x2, state)
    return F.mul(x3, F.sqr(x2))


def _c(F, v: int):
    return F.full((), v)


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

        swap = lw[self.WIRE_SWAP]
        # swap binary: swap*swap - swap (reference poseidon_goldilocks.rs
        # native :?; circuit :312 mul_sub_extension(swap, swap, swap))
        constraints.append(A.mul_sub(swap, swap, swap))

        for i in range(4):
            lhs = lw[self.wire_input(i)]
            rhs = lw[self.wire_input(i + 4)]
            delta = lw[self.wire_delta(i)]
            # swap*(rhs - lhs) - delta as one fused op (reference :316-321)
            constraints.append(A.mul_sub(swap, A.sub(rhs, lhs), delta))

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

        # Partial rounds.  The circuit evaluation with enough routed wires
        # for PoseidonMdsGate uses the NAIVE schedule — full constant layer,
        # single-lane sbox, one MDS gate per round (reference
        # gates/poseidon_goldilocks.rs:354-363) — while every other mode
        # uses the fast schedule.  The two yield identical constraint
        # values: the fast schedule preserves the lane-0 sbox inputs and the
        # final state by construction.
        use_mds_gate = (
            getattr(A, "poseidon_mds_layer", None) is not None
            and A.b.config.num_routed_wires >= 2 * A.spec.ext_degree * W)
        if use_mds_gate:
            for r in range(NP):
                state = pg.constant_layer_a(A, state, round_ctr)
                sbox_in = lw[self.wire_partial_sbox(r)]
                constraints.append(A.sub(state[0], sbox_in))
                state[0] = pg.sbox_monomial_a(A, sbox_in)
                state = pg.mds_layer_a(A, state)
                round_ctr += 1
        else:
            state = pg.partial_first_constant_layer_a(A, state)
            state = pg.mds_partial_layer_init_a(A, state)
            for r in range(NP - 1):
                sbox_in = lw[self.wire_partial_sbox(r)]
                constraints.append(A.sub(state[0], sbox_in))
                state[0] = pg.sbox_monomial_a(A, sbox_in)
                state[0] = A.add_base_const(
                    state[0], C.FAST_PARTIAL_ROUND_CONSTANTS[r])
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

    # ---- batched device evaluation ----------------------------------------
    # The generic eval above traces ~2100 field ops; over a whole quotient
    # domain that explodes XLA compile time.  This path computes the SAME
    # constraints (same values, same order) with lax.scan over rounds and
    # broadcast-matmul MDS layers — a ~30x smaller graph.

    def eval_unfiltered_device(self, F, stacked_wires, vars) -> list:
        import jax
        import jax.numpy as jnp
        import numpy as np

        assert F.SPEC.name == "goldilocks"
        tree_map = jax.tree_util.tree_map

        def rows(lo_r, hi_r):
            return tree_map(lambda a: a[lo_r:hi_r], stacked_wires)

        def row(r):
            return tree_map(lambda a: a[r], stacked_wires)

        def consts(vals):
            return F.from_ints(np.array(vals, dtype=np.uint64))

        def mds(state):
            """state (12, m) -> MDS @ state via broadcast-mul + tree-sum."""
            m_const = consts(_MDS_FULL)          # (12, 12): M[r, c]
            prod = F.mul(tree_map(lambda a: a[:, None, :], state),
                         tree_map(lambda a: a[:, :, None], m_const))
            return F.batch_sum(prod, axis=0)     # out[c] = sum_r s[r] M[r,c]

        g = PoseidonGate
        inputs = rows(0, W)
        outputs = rows(W, 2 * W)
        swap = row(g.WIRE_SWAP)
        deltas = rows(g._START_DELTA, g._START_DELTA + 4)
        full0_w = tree_map(
            lambda a: a[g._START_FULL_0:g._START_PARTIAL].reshape(
                HALF - 1, W, -1), stacked_wires)
        partial_w = rows(g._START_PARTIAL, g._START_FULL_1)
        full1_w = tree_map(
            lambda a: a[g._START_FULL_1:g.end()].reshape(HALF, W, -1),
            stacked_wires)

        constraints = []
        one = F.ones(())
        constraints.append(F.mul(swap, F.sub(swap, one)))
        lhs = tree_map(lambda a: a[0:4], stacked_wires)
        rhs = tree_map(lambda a: a[4:8], stacked_wires)
        delta_c = F.sub(F.mul(tree_map(lambda a: a[None], swap),
                              F.sub(rhs, lhs)), deltas)
        for i in range(4):
            constraints.append(tree_map(lambda a: a[i], delta_c))

        # swapped input state
        top = F.add(lhs, deltas)
        bot = F.sub(rhs, deltas)
        tail = rows(8, W)
        state = tree_map(lambda a, b, c: jnp.concatenate([a, b, c], axis=0),
                         top, bot, tail)

        rc = np.array(C.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, W)

        # full rounds 0..HALF: round 0 inline, rounds 1..HALF-1 scanned
        state = F.add(state, tree_map(lambda a: a[:, None], consts(rc[0])))
        state = mds(_sbox_cols(F, state))

        def full0_step(st, xs):
            rc_r, wires_r = xs
            st = F.add(st, tree_map(lambda a: a[:, None], rc_r))
            cons = F.sub(st, wires_r)
            st = mds(_sbox_cols(F, wires_r))
            return st, cons

        state, cons0 = jax.lax.scan(
            full0_step, state,
            (consts(rc[1:HALF]), full0_w))
        for r in range(HALF - 1):
            for i in range(W):
                constraints.append(tree_map(lambda a: a[r, i], cons0))

        # partial rounds: init layers then a 22-step scan
        state = F.add(state, tree_map(
            lambda a: a[:, None],
            consts(C.FAST_PARTIAL_FIRST_ROUND_CONSTANT)))
        init_m = consts(_INIT_FULL)              # (12, 12)
        prod = F.mul(tree_map(lambda a: a[:, None, :], state),
                     tree_map(lambda a: a[:, :, None], init_m))
        state = F.batch_sum(prod, axis=0)

        fast_rc = list(C.FAST_PARTIAL_ROUND_CONSTANTS[:NP - 1]) + [0]
        w_hats = np.array(C.FAST_PARTIAL_ROUND_W_HATS, dtype=np.uint64)
        vs = np.array(C.FAST_PARTIAL_ROUND_VS, dtype=np.uint64)
        mds00 = C.MDS_MATRIX_CIRC[0] + C.MDS_MATRIX_DIAG[0]

        def partial_step(st, xs):
            wire_r, rc_r, wh_r, vs_r = xs
            s0 = tree_map(lambda a: a[0], st)
            cons = F.sub(s0, wire_r)
            s0 = F.add(_sbox_cols(F, wire_r), rc_r)
            tail_ = tree_map(lambda a: a[1:], st)
            d = F.add(F.mul(s0, _c(F, mds00)),
                      F.batch_sum(F.mul(tail_,
                                        tree_map(lambda a: a[:, None], wh_r)),
                                  axis=0))
            new_tail = F.add(F.mul(tree_map(lambda a: a[None], s0),
                                   tree_map(lambda a: a[:, None], vs_r)),
                             tail_)
            st = tree_map(lambda a, b: jnp.concatenate([a[None], b], axis=0),
                          d, new_tail)
            return st, cons

        state, cons_p = jax.lax.scan(
            partial_step, state,
            (partial_w, consts(fast_rc), consts(w_hats), consts(vs)))
        for r in range(NP):
            constraints.append(tree_map(lambda a: a[r], cons_p))

        # second set of full rounds, scanned
        def full1_step(st, xs):
            rc_r, wires_r = xs
            st = F.add(st, tree_map(lambda a: a[:, None], rc_r))
            cons = F.sub(st, wires_r)
            st = mds(_sbox_cols(F, wires_r))
            return st, cons

        state, cons1 = jax.lax.scan(
            full1_step, state,
            (consts(rc[HALF + NP:]), full1_w))
        for r in range(HALF):
            for i in range(W):
                constraints.append(tree_map(lambda a: a[r, i], cons1))

        out_c = F.sub(state, outputs)
        for i in range(W):
            constraints.append(tree_map(lambda a: a[i], out_c))

        assert len(constraints) == self.num_constraints()
        return constraints


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
