"""Lower witness generators to native VM instruction streams.

Each generator class gets a *lowerer* that re-expresses its ``run_once``
dataflow as flat instructions over the witness representative array
(reference semantics: plonky2/src/iop/generator.rs:228-460 and the per-gate
generators).  Generators whose math is pure straight-line field algebra are
lowered by symbolically executing the SAME algebra functions the Python path
uses (e.g. hash/poseidon_gl.py ``*_a`` helpers) with :class:`EmitAlgebra`,
so the native values are definitionally identical to the host values.

Data-dependent branches that can't lower symbolically are handled one of
two ways: branch-free reformulation (the Merkle swap in the Poseidon gates:
``state = wv +/- swap * (b - a)``), or native control ops (SELECT / SPLITR /
LUTMAP).  Generators with no lowerer (randomness, which must replay the
host RNG stream) run as Python fallback segments between native segments.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..field import host
from ..gates.base import _FusedOpsMixin
from ..iop import target as tgt

# opcodes (must match witgen.c)
CONST, COPY, ADD, SUB, MUL, MULC, ADDC, RSUBC, MAC, MACI, INV, POW7, \
    SELECT, BIT, SPLITR, SHRM, ASHR0, ABOOL, LUTMAP = range(19)


class Prog:
    """One native segment under construction."""

    def __init__(self, num_reps: int, p: int):
        self.num_reps = num_reps
        self.p = p
        self.code: List[int] = []
        self.pool: List[int] = []
        self.n_temps = 0
        self._consts: Dict[int, int] = {}

    def temp(self) -> int:
        t = self.num_reps + self.n_temps
        self.n_temps += 1
        return t

    def emit(self, op, dst, a=0, b=0, c=0):
        self.code.extend((op, dst, a, b, c))

    def emit_t(self, op, a=0, b=0, c=0) -> int:
        d = self.temp()
        self.emit(op, d, a, b, c)
        return d

    def const(self, v: int) -> int:
        v = v % self.p
        t = self._consts.get(v)
        if t is None:
            t = self.emit_t(CONST, v)
            self._consts[v] = t
        return t

    def pool_put(self, idxs) -> int:
        off = len(self.pool)
        self.pool.extend(int(i) for i in idxs)
        return off

    def arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        return (np.array(self.code, dtype=np.uint64),
                np.array(self.pool, dtype=np.uint64))


class EmitAlgebra(_FusedOpsMixin):
    """HostBaseAlgebra-shaped algebra whose values are VM value indices;
    every operation appends an instruction."""

    def __init__(self, prog: Prog, spec: host.FieldSpec):
        self.prog = prog
        self.spec = spec
        self.p = spec.p

    def from_int(self, c: int):
        return self.prog.const(c)

    def zero(self):
        return self.prog.const(0)

    def one(self):
        return self.prog.const(1)

    def add(self, a, b):
        return self.prog.emit_t(ADD, a, b)

    def sub(self, a, b):
        return self.prog.emit_t(SUB, a, b)

    def neg(self, a):
        return self.prog.emit_t(RSUBC, a, 0)

    def mul(self, a, b):
        return self.prog.emit_t(MUL, a, b)

    def mul_base_const(self, a, c: int):
        return self.prog.emit_t(MULC, a, c % self.p)

    def add_base_const(self, a, c: int):
        return self.prog.emit_t(ADDC, a, c % self.p)

    def mul_scalar(self, a, s: int):
        return self.mul_base_const(a, s)

    def lift_scalar(self, s: int):
        return self.prog.const(s)

    def exp7(self, x):
        return self.prog.emit_t(POW7, x)

    def mul_add(self, a, b, c):
        return self.prog.emit_t(MAC, a, b, c)

    def const_mul_add(self, c: int, x, acc):
        return self.prog.emit_t(MACI, x, acc, c % self.p)

    def const_mul(self, c: int, x):
        return self.mul_base_const(x, c)

    def inv(self, a):
        return self.prog.emit_t(INV, a)


# -- extension algebra over index tuples -------------------------------------


def e_add(A, a, b):
    return tuple(A.add(x, y) for x, y in zip(a, b))


def e_sub(A, a, b):
    return tuple(A.sub(x, y) for x, y in zip(a, b))


def e_from_base(A, x):
    d = A.spec.ext_degree
    return (x,) + (A.zero(),) * (d - 1)


def e_scalar_mul_c(A, a, s: int):
    return tuple(A.mul_base_const(x, s) for x in a)


def e_scalar_mul(A, a, s):
    return tuple(A.mul(x, s) for x in a)


def e_mul(A, a, b):
    """Schoolbook with X^D = W folding (host.ext_mul mirror)."""
    spec = A.spec
    d, w = spec.ext_degree, spec.ext_w
    acc = [None] * (2 * d - 1)
    for i in range(d):
        for j in range(d):
            t = A.mul(a[i], b[j])
            acc[i + j] = t if acc[i + j] is None else A.add(acc[i + j], t)
    out = list(acc[:d])
    for k in range(d, 2 * d - 1):
        out[k - d] = A.const_mul_add(w, acc[k], out[k - d])
    return tuple(out)


def e_frobenius(A, a, count: int = 1):
    spec = A.spec
    p, d, w = spec.p, spec.ext_degree, spec.ext_w
    z = pow(w, (p - 1) // d, p)
    zc = pow(z, count % d, p)
    out, s = [], 1
    for i in range(d):
        out.append(A.mul_base_const(a[i], s))
        s = s * zc % p
    return tuple(out)


def e_inv(A, a):
    """host.ext_inv mirror: conj(a)/N(a) via Frobenius products."""
    d = A.spec.ext_degree
    if d == 1:
        return (A.inv(a[0]),)
    conj = e_frobenius(A, a, 1)
    for i in range(2, d):
        conj = e_mul(A, conj, e_frobenius(A, a, i))
    norm = e_mul(A, a, conj)[0]      # norm is in the base field
    ninv = A.inv(norm)
    return e_scalar_mul(A, conj, ninv)


# -- lowering context --------------------------------------------------------


class Ctx:
    def __init__(self, prog: Prog, spec: host.FieldSpec,
                 rep_map: np.ndarray, num_wires: int, degree: int):
        self.prog = prog
        self.spec = spec
        self.A = EmitAlgebra(prog, spec)
        self._rep = rep_map
        self._nw = num_wires
        self._deg = degree

    def rep(self, t) -> int:
        return int(self._rep[tgt.target_index(t, self._nw, self._deg)])

    def store(self, t, src: int):
        """Write a computed value into a representative slot (checked)."""
        self.prog.emit(COPY, self.rep(t), src)

    def store_wire(self, row, col, src):
        self.prog.emit(COPY, self.rep(tgt.wire(row, col)), src)


# -- per-generator lowerers --------------------------------------------------

LOWERERS: Dict[type, object] = {}


def lowers(cls):
    def deco(fn):
        LOWERERS[cls] = fn
        return fn
    return deco


def _register_core():
    from ..gates.access_gates import (_BaseSplitGenerator,
                                      _ExponentiationGenerator,
                                      _RandomAccessGenerator, BaseSumGate)
    from ..gates.basic_gates import _ArithmeticOpGenerator, ArithmeticGate
    from ..gates.coset_interpolation import _InterpolationGenerator
    from ..gates.extension_gates import (_ArithmeticExtOpGenerator,
                                         _MulExtOpGenerator)
    from ..gates.lookup_gates import _LookupGenerator, LookupGate
    from ..gates.misc_gates import (_AddManyGenerator, _ApplyMat4Generator,
                                    _InternalPermGenerator)
    from ..gates.reducing import _ReducingGenerator
    from ..iop.generator import ConstantGenerator, CopyGenerator
    from ..plonk.builder import _ExtInverseGenerator
    from ..plonk.gadgets import (_BaseSumGenerator, _WireSplitGenerator)

    @lowers(ConstantGenerator)
    def _l_const(g, ctx):
        ctx.prog.emit(CONST, ctx.rep(tgt.wire(g.row, g.wire_index)),
                      g.constant % ctx.spec.p)

    @lowers(CopyGenerator)
    def _l_copy(g, ctx):
        ctx.prog.emit(COPY, ctx.rep(g.dst), ctx.rep(g.src))

    @lowers(_ArithmeticOpGenerator)
    def _l_arith(g, ctx):
        # (c0 * m0 * m1 + c1 * ad) mod p  (gates/arithmetic_base.rs:28-160)
        w0, w1, wa, wo = ArithmeticGate.wires(g.i)
        r = lambda w: ctx.rep(tgt.wire(g.row, w))  # noqa: E731
        prog, p = ctx.prog, ctx.spec.p
        t = prog.emit_t(MUL, r(w0), r(w1))
        t2 = prog.emit_t(MULC, t, g.c0 % p)
        prog.emit(MACI, r(wo), r(wa), t2, g.c1 % p)

    @lowers(_AddManyGenerator)
    def _l_addmany(g, ctx):
        r = lambda w: ctx.rep(tgt.wire(g.row, w))  # noqa: E731
        ws = list(g.gate.wires_addends(g.i))
        acc = r(ws[0]) if ws else ctx.prog.const(0)
        for w in ws[1:]:
            acc = ctx.prog.emit_t(ADD, acc, r(w))
        ctx.prog.emit(COPY, r(g.gate.wire_sum(g.i)), acc)

    @lowers(_BaseSplitGenerator)
    def _l_basesplit(g, ctx):
        gate = g.gate
        src = ctx.rep(tgt.wire(g.row, BaseSumGate.WIRE_SUM))
        dsts = [ctx.rep(tgt.wire(g.row, i)) for i in gate.limbs()]
        off = ctx.prog.pool_put(dsts)
        ctx.prog.emit(SPLITR, len(dsts), src, off, gate.base)

    @lowers(_WireSplitGenerator)
    def _l_wiresplit(g, ctx):
        src = ctx.rep(g.integer)
        mask = (1 << g.num_limbs) - 1
        for k, row in enumerate(g.rows):
            ctx.prog.emit(SHRM, ctx.rep(tgt.wire(row, BaseSumGate.WIRE_SUM)),
                          src, k * g.num_limbs, mask)
        ctx.prog.emit(ASHR0, 0, src, len(g.rows) * g.num_limbs)

    @lowers(_BaseSumGenerator)
    def _l_basesum(g, ctx):
        # v = sum_i bit_i << i; bits are boolean so the mod-p Horner chain
        # produces the identical integer (gadgets.py _BaseSumGenerator)
        bits = [ctx.rep(t) for t in g.bits]
        acc = bits[-1]
        for bidx in reversed(bits[:-1]):
            acc = ctx.prog.emit_t(MACI, acc, bidx, 2)
        ctx.prog.emit(COPY, ctx.rep(tgt.wire(g.row, BaseSumGate.WIRE_SUM)),
                      acc)

    @lowers(_ExponentiationGenerator)
    def _l_exp(g, ctx):
        gate, prog = g.gate, ctx.prog
        r = lambda w: ctx.rep(tgt.wire(g.row, w))  # noqa: E731
        base = r(gate.wire_base())
        nb = gate.num_power_bits
        bits = [r(gate.wire_power_bit(i)) for i in range(nb)]
        inter = prog.const(1)
        for i in range(nb):
            prev = inter if i == 0 else prog.emit_t(MUL, inter, inter)
            cb = bits[nb - i - 1]
            u = prog.emit_t(MUL, cb, base)
            nbit = prog.emit_t(RSUBC, cb, 1)
            term = prog.emit_t(ADD, u, nbit)
            inter = prog.emit_t(MUL, prev, term)
            prog.emit(COPY, r(gate.wire_intermediate_value(i)), inter)
        prog.emit(COPY, r(gate.wire_output()), inter)

    @lowers(_RandomAccessGenerator)
    def _l_randacc(g, ctx):
        gate, prog = g.gate, ctx.prog
        r = lambda w: ctx.rep(tgt.wire(g.row, w))  # noqa: E731
        idx = r(gate.wire_access_index(g.copy))
        items = [r(gate.wire_list_item(i, g.copy))
                 for i in range(gate.vec_size)]
        off = prog.pool_put(items)
        prog.emit(SELECT, r(gate.wire_claimed_element(g.copy)), idx, off,
                  gate.vec_size)
        for i in range(gate.bits):
            prog.emit(BIT, r(gate.wire_bit(i, g.copy)), idx, i)

    @lowers(_LookupGenerator)
    def _l_lookup(g, ctx):
        # native fast path only when the table is value-indexed
        # (lut[v][0] == v for all v) — the repo's default LUT layout
        # (gates/lookup_gates.py _LookupGenerator fast path); otherwise
        # the caller falls back to Python.
        prog = ctx.prog
        inp = ctx.rep(tgt.wire(g.row, LookupGate.wire_ith_looking_inp(g.slot)))
        table = [int(o) for _, o in g.lut]
        key = ("lut", id(g.lut))
        off = prog._consts.get(key)
        if off is None:
            off = prog.pool_put([len(table)] + table)
            prog._consts[key] = off
        prog.emit(LUTMAP, ctx.rep(tgt.wire(
            g.row, LookupGate.wire_ith_looking_out(g.slot))), inp, off)

    _l_lookup.can_lower = lambda g: all(
        int(t[0]) == i for i, t in enumerate(g.lut))

    @lowers(_ArithmeticExtOpGenerator)
    def _l_arith_ext(g, ctx):
        A = ctx.A
        m0r, m1r, adr, outr = g.gate.wires_op(g.i)
        r = lambda ws: tuple(ctx.rep(tgt.wire(g.row, w)) for w in ws)  # noqa
        prod = e_mul(A, r(m0r), r(m1r))
        res = e_add(A, e_scalar_mul_c(A, prod, g.c0),
                    e_scalar_mul_c(A, r(adr), g.c1))
        for w, v in zip(outr, res):
            ctx.store_wire(g.row, w, v)

    @lowers(_MulExtOpGenerator)
    def _l_mul_ext(g, ctx):
        A = ctx.A
        m0r, m1r, outr = g.gate.wires_op(g.i)
        r = lambda ws: tuple(ctx.rep(tgt.wire(g.row, w)) for w in ws)  # noqa
        res = e_scalar_mul_c(A, e_mul(A, r(m0r), r(m1r)), g.c0)
        for w, v in zip(outr, res):
            ctx.store_wire(g.row, w, v)

    @lowers(_ExtInverseGenerator)
    def _l_ext_inv(g, ctx):
        vals = tuple(ctx.rep(t) for t in g.a)
        inv = e_inv(ctx.A, vals)
        for t, v in zip(g.inv_targets, inv):
            ctx.store(t, v)

    @lowers(_ReducingGenerator)
    def _l_reducing(g, ctx):
        A = ctx.A
        gate = g.gate
        r = lambda w: ctx.rep(tgt.wire(g.row, w))  # noqa: E731
        alpha = tuple(r(w) for w in gate.wires_alpha())
        acc = tuple(r(w) for w in gate.wires_old_acc())
        coeff_wires = ([[r(w) for w in gate.wires_coeff(i)]
                        for i in range(gate.num_coeffs)] if g.ext_coeffs
                       else [[r(w)] for w in gate.wires_coeffs()])
        for i, ws in enumerate(coeff_wires):
            c = tuple(ws) if len(ws) > 1 else e_from_base(A, ws[0])
            acc = e_add(A, e_mul(A, acc, alpha), c)
            for w, v in zip(gate.wires_accs(i), acc):
                ctx.store_wire(g.row, w, v)

    @lowers(_InterpolationGenerator)
    def _l_interp(g, ctx):
        # straight-line mirror of coset_interpolation.py run_once
        A = ctx.A
        gate = g.gate
        r = lambda w: ctx.rep(tgt.wire(g.row, w))  # noqa: E731
        shift = r(gate.wire_shift())
        eval_point = tuple(r(w) for w in gate.wires_evaluation_point())
        shift_inv = A.inv(shift)
        shifted = e_scalar_mul(A, eval_point, shift_inv)
        for w, v in zip(gate.wires_shifted_evaluation_point(), shifted):
            ctx.store_wire(g.row, w, v)
        values = [tuple(r(w) for w in gate.wires_value(i))
                  for i in range(gate.num_points)]
        d = gate.gate_degree

        def pinterp(dom, vals, ws, ev, prod):
            for val, wgt, x_i in zip(vals, ws, dom):
                val_w = e_scalar_mul_c(A, val, wgt)
                term = e_sub(A, shifted, e_from_base(A, A.from_int(x_i)))
                ev = e_add(A, e_mul(A, ev, term), e_mul(A, val_w, prod))
                prod = e_mul(A, prod, term)
            return ev, prod

        dd = A.spec.ext_degree
        ev = (A.zero(),) * dd
        prod = (A.one(),) + (A.zero(),) * (dd - 1)
        ev, prod = pinterp(gate.domain[:d], values[:d],
                           gate.barycentric_weights[:d], ev, prod)
        for i in range(gate.num_intermediates()):
            for w, v in zip(gate.wires_intermediate_eval(i), ev):
                ctx.store_wire(g.row, w, v)
            for w, v in zip(gate.wires_intermediate_prod(i), prod):
                ctx.store_wire(g.row, w, v)
            start = 1 + (d - 1) * (i + 1)
            end = min(start + d - 1, gate.num_points)
            ev, prod = pinterp(gate.domain[start:end], values[start:end],
                               gate.barycentric_weights[start:end], ev, prod)
        for w, v in zip(gate.wires_evaluation_value(), ev):
            ctx.store_wire(g.row, w, v)

    _register_swap_perms()
    _register_mat_perms()


def _swap_state(ctx, g, gate_w, cap, wire_input, wire_swap, wire_delta):
    """Branch-free Merkle-swap prologue shared by the Poseidon-family
    generators: delta_i = swap*(b_i - a_i); swapped state via +/- delta."""
    prog = ctx.prog
    r = lambda w: ctx.rep(tgt.wire(g.row, w))  # noqa: E731
    wv = [r(wire_input(i)) for i in range(gate_w)]
    swap = r(wire_swap())
    prog.emit(ABOOL, 0, swap)
    state = list(wv)
    for i in range(cap):
        diff = prog.emit_t(SUB, wv[i + cap], wv[i])
        delta = prog.emit_t(MUL, swap, diff)
        prog.emit(COPY, r(wire_delta(i)), delta)
        state[i] = prog.emit_t(ADD, wv[i], delta)
        state[i + cap] = prog.emit_t(SUB, wv[i + cap], delta)
    return state


def _register_swap_perms():
    from ..gates import poseidon as pos
    from ..gates.poseidon import PoseidonGenerator
    from ..hash import _poseidon_gl_constants as PC
    from ..hash import poseidon_gl as pg

    @lowers(PoseidonGenerator)
    def _l_poseidon(g, ctx):
        # mirror of gates/poseidon.py PoseidonGenerator.run_once
        # (reference gates/poseidon_goldilocks.rs:438-533)
        A = ctx.A
        GG = pos.PoseidonGate
        r = lambda w: ctx.rep(tgt.wire(g.row, w))  # noqa: E731
        state = _swap_state(ctx, g, pos.W, 4, GG.wire_input,
                            lambda: GG.WIRE_SWAP, GG.wire_delta)
        round_ctr = 0
        for rr in range(pos.HALF):
            state = pg.constant_layer_a(A, state, round_ctr)
            if rr != 0:
                for i in range(pos.W):
                    ctx.prog.emit(COPY, r(GG.wire_full_sbox_0(rr, i)),
                                  state[i])
            state = pg.sbox_layer_a(A, state)
            state = pg.mds_layer_a(A, state)
            round_ctr += 1
        state = pg.partial_first_constant_layer_a(A, state)
        state = pg.mds_partial_layer_init_a(A, state)
        for rr in range(pos.NP - 1):
            ctx.prog.emit(COPY, r(GG.wire_partial_sbox(rr)), state[0])
            state[0] = pg.sbox_monomial_a(A, state[0])
            state[0] = A.add_base_const(
                state[0], PC.FAST_PARTIAL_ROUND_CONSTANTS[rr])
            state = pg.mds_partial_layer_fast_a(A, state, rr)
        ctx.prog.emit(COPY, r(GG.wire_partial_sbox(pos.NP - 1)), state[0])
        state[0] = pg.sbox_monomial_a(A, state[0])
        state = pg.mds_partial_layer_fast_a(A, state, pos.NP - 1)
        round_ctr += pos.NP
        for rr in range(pos.HALF):
            state = pg.constant_layer_a(A, state, round_ctr)
            for i in range(pos.W):
                ctx.prog.emit(COPY, r(GG.wire_full_sbox_1(rr, i)), state[i])
            state = pg.sbox_layer_a(A, state)
            state = pg.mds_layer_a(A, state)
            round_ctr += 1
        for i in range(pos.W):
            ctx.prog.emit(COPY, r(GG.wire_output(i)), state[i])

    def _swap_perm_lowerer(Wd, CAPd, HALFd, NPd, mod, consts):
        def _lower(g, ctx):
            A = ctx.A
            gate, op = g.gate, g.op
            r = lambda w: ctx.rep(tgt.wire(g.row, w))  # noqa: E731
            state = _swap_state(
                ctx, g, Wd, CAPd, lambda i: gate.wire_input(op, i),
                lambda: gate.wire_swap(op),
                lambda i: gate.wire_delta(op, i))
            state = mod.external_layer_a(A, state)
            for rr in range(HALFd):
                state = [A.add_base_const(x, c)
                         for x, c in zip(state, consts.EXTERNAL_CONSTANTS[rr])]
                if rr > 0:
                    for i in range(Wd):
                        ctx.prog.emit(
                            COPY, r(gate.wire_full_sbox_0(op, rr, i)),
                            state[i])
                state = [mod.sbox_a(A, x) for x in state]
                state = mod.external_layer_a(A, state)
            for rr in range(NPd):
                state[0] = A.add_base_const(state[0],
                                            consts.INTERNAL_CONSTANTS[rr])
                ctx.prog.emit(COPY, r(gate.wire_partial_sbox(op, rr)),
                              state[0])
                state[0] = mod.sbox_a(A, state[0])
                state = mod.internal_layer_a(A, state)
            for rr in range(HALFd, consts.N_FULL_ROUNDS_TOTAL):
                state = [A.add_base_const(x, c)
                         for x, c in zip(state, consts.EXTERNAL_CONSTANTS[rr])]
                for i in range(Wd):
                    ctx.prog.emit(
                        COPY, r(gate.wire_full_sbox_1(op, rr - HALFd, i)),
                        state[i])
                state = [mod.sbox_a(A, x) for x in state]
                state = mod.external_layer_a(A, state)
            for i in range(Wd):
                ctx.prog.emit(COPY, r(gate.wire_output(op, i)), state[i])
        return _lower

    try:
        from ..gates import poseidon2_bb_gate as g2
        from ..hash import _poseidon2_bb_constants as C2
        from ..hash import poseidon2_bb as p2
        LOWERERS[g2._Poseidon2Generator] = _swap_perm_lowerer(
            g2.W, g2.CAP, g2.HALF, g2.NP, p2, C2)
    except ImportError:  # pragma: no cover
        pass
    try:
        from ..gates import poseidon2_r0_bb_gate as gr
        from ..hash import _poseidon2_r0_bb_constants as CR
        from ..hash import poseidon2_r0_bb as r0
        LOWERERS[gr._Poseidon2R0Generator] = _swap_perm_lowerer(
            gr.W, gr.CAP, gr.HALF, gr.NP, r0, CR)
    except ImportError:  # pragma: no cover
        pass


def _register_mat_perms():
    from ..gates.misc_gates import (_ApplyMat4Generator,
                                    _InternalPermGenerator, W as P2W)
    from ..hash import poseidon2_bb as p2

    @lowers(_ApplyMat4Generator)
    def _l_mat4(g, ctx):
        A = ctx.A
        gate = g.gate
        for d in range(gate.D):
            x = [ctx.rep(tgt.wire(g.row, list(gate.wires_input(g.op, i))[d]))
                 for i in range(4)]
            y = p2.apply_mat4_a(A, x)
            for i in range(4):
                ctx.store_wire(g.row,
                               list(gate.wires_output(g.op, i))[d], y[i])

    @lowers(_InternalPermGenerator)
    def _l_intperm(g, ctx):
        A = ctx.A
        gate = g.gate
        for d in range(gate.D):
            state = [ctx.rep(tgt.wire(g.row, list(gate.wires_input(i))[d]))
                     for i in range(P2W)]
            y = p2.internal_layer_a(A, state)
            for i in range(P2W):
                ctx.store_wire(g.row, list(gate.wires_output(i))[d], y[i])


_register_core()


def lowerer_for(g) -> Optional[object]:
    fn = LOWERERS.get(type(g))
    if fn is None:
        return None
    can = getattr(fn, "can_lower", None)
    if can is not None and not can(g):
        return None
    return fn
