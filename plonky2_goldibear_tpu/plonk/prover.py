"""The PLONK prover (reference plonky2/src/plonk/prover.rs:136-926).

Host/device split (SURVEY.md §7): witness generation and Fiat-Shamir run on
host; each batched phase — LDE+Merkle commits, partial products/Z via scans,
whole-domain vanishing-poly evaluation, openings, FRI — is one jitted device
program per circuit.  Fiat-Shamir challenges enter the compiled programs as
*traced scalars*, so one compilation serves every proof (and every retry of
the anti-#456 loop).  Unlike the reference's 32-point batches
(prover.rs:710), the quotient is evaluated over the entire domain at once.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import ext as ext_mod
from ..field import fft as fftm
from ..field import gl as gl_mod
from ..field import host
from ..fri import prover as fri_prover
from ..fri.oracle import PolynomialBatch
from ..gates.base import DeviceBaseAlgebra, EvaluationVars
from ..hash import poseidon_gl
from ..hash.challenger import Challenger
from ..iop.generator import generate_partial_witness, rand_field_element
from ..iop.witness import PartialWitness
from ..utils.timing import StatisticsItem, timed
from . import vanishing
from .proof import OpeningSet, Proof, ProofWithPublicInputs

tree_map = jax.tree_util.tree_map


class InvZeroPermArg(Exception):
    """Permutation-argument division by zero (reference prover.rs:515)."""


MAX_PERM_ARG_RETRIES = 3


def prove(prover_data, common, inputs: PartialWitness,
          F=gl_mod, hasher=poseidon_gl, inner_hasher=None,
          timing=None) -> ProofWithPublicInputs:
    """reference prover.rs:136-230 (incl. the anti-#456 retry loop).

    ``timing`` is an optional ``utils.timing.ProvingProcessInfo``; phases
    push scopes into it (reference util/proving_process_info.rs)."""
    from ..utils.envflags import env_flag
    from .witness_transfer import WitnessTransfer

    with timed(timing, "run witness generators"):
        partition_witness = generate_partial_witness(inputs, prover_data,
                                                     common)
        set_lookup_wires(prover_data, common, partition_witness)
        public_inputs = partition_witness.get_targets(
            prover_data.public_inputs)
        # lookup circuits read the dense matrix on host
        # (compute_lookup_polys); others ship the compact rep values and
        # scatter on device (witness_transfer.py)
        dense = (common.num_lookup_polys != 0
                 or env_flag("PLONKY2_TPU_DENSE_WITNESS"))
        wt = WitnessTransfer(F, partition_witness, prover_data, common,
                             dense=dense)
        witness = wt.matrix

    from . import prover_async

    # Device-transcript pipeline: async dispatch chain, ONE blocking fetch.
    # The sync host-challenger path remains for byte-digest hashers
    # (Keccak), for phase-attributed timing runs, and as a kill switch.
    use_async = (timing is None
                 and prover_async.available(F, hasher, common.config)
                 and not env_flag("PLONKY2_TPU_SYNC_FS"))

    for retry_idx in range(MAX_PERM_ARG_RETRIES):
        if retry_idx > 0:
            assert prover_data.random_wire is not None, \
                "perm-arg failure with no random wire"
            if timing is not None:
                timing.incr(StatisticsItem.PERM_ARG_RETRIES)
            row, col = prover_data.random_wire
            wt.set(row, col, rand_field_element(common.spec.p))
        try:
            wires_values = wt.device_values()
            if use_async:
                return prover_async.internal_prove_async(
                    prover_data, common, wires_values, witness,
                    public_inputs, F, hasher, inner_hasher or hasher)
            return _internal_prove(prover_data, common, wires_values,
                                   witness, public_inputs, F, hasher,
                                   inner_hasher or hasher, timing)
        except InvZeroPermArg:
            continue
    raise InvZeroPermArg("too many permutation argument failures")


def _ext_ops(F):
    return ext_mod.gl2 if F.SPEC.name == "goldilocks" else ext_mod.bb4


def set_lookup_wires(prover_data, common, pw):
    """Fill multiplicities and pad unused looking slots
    (reference prover.rs:64-134)."""
    from ..gates.lookup_gates import LookupGate, LookupTableGate
    from ..iop import target as tgt
    for lut_index, (last_lu, last_lut, first_lut) in enumerate(
            prover_data.lookup_rows):
        lut = common.luts[lut_index]
        num_entries = LookupGate.num_slots_of(common.config)
        num_lut_entries = LookupTableGate.num_slots_of(common.config)

        multiplicities = [0] * len(lut)
        value_to_idx = {inp: i for i, (inp, _) in enumerate(lut)}
        for inp_target, _ in prover_data.lut_to_lookups[lut_index]:
            inp_value = pw.get_target(inp_target)
            multiplicities[value_to_idx[inp_value]] += 1

        # pad the last LookupGate with the first LUT entry
        n_lookups = len(prover_data.lut_to_lookups[lut_index])
        remaining = (num_entries - n_lookups % num_entries) % num_entries
        first_inp, first_out = lut[0]
        for slot in range(num_entries - remaining, num_entries):
            pw.set_target(tgt.wire(last_lut - 1,
                                   LookupGate.wire_ith_looking_inp(slot)),
                          first_inp)
            pw.set_target(tgt.wire(last_lut - 1,
                                   LookupGate.wire_ith_looking_out(slot)),
                          first_out)
            multiplicities[0] += 1

        for entry in range(len(lut)):
            row = first_lut - entry // num_lut_entries
            col = entry % num_lut_entries
            pw.set_target(
                tgt.wire(row, LookupTableGate.wire_ith_multiplicity(col)),
                multiplicities[entry])


def compute_lookup_polys(common, prover_data, witness, deltas4):
    """RE + partial SLDC columns for one challenge set (reference
    prover.rs:555-674); rows are upside down, built backwards.

    Dispatches to the batched device implementation (scans over the row
    axis) unless PLONKY2_TPU_HOST_LOOKUPS forces the scalar host loop,
    which remains as the semantics reference."""
    from ..utils.envflags import env_flag
    if not env_flag("PLONKY2_TPU_HOST_LOOKUPS"):
        return compute_lookup_polys_batched(common, prover_data, witness,
                                            deltas4)
    return compute_lookup_polys_host(common, prover_data, witness, deltas4)


def compute_lookup_polys_host(common, prover_data, witness, deltas4):
    """Scalar host reference for compute_lookup_polys (one Python int op
    per slot per row; kept for cross-checking the batched path)."""
    from ..gates.lookup_gates import LookupGate, LookupTableGate
    p = common.spec.p
    degree = common.degree
    num_lu_slots = LookupGate.num_slots_of(common.config)
    max_lookup_degree = common.config.max_quotient_degree_factor - 1
    num_partial = -(-num_lu_slots // max_lookup_degree)
    num_lut_slots = LookupTableGate.num_slots_of(common.config)
    max_lut_degree = -(-num_lut_slots // num_partial)
    d_a, d_b, d_alpha, d_delta = deltas4

    polys = [[0] * degree for _ in range(num_partial + 1)]
    wv = witness  # (num_wires, degree) numpy uint64

    # Pass 1 (batched): every row's denominators (d_alpha - combo) inverted
    # in ONE Montgomery-trick batch_inv — the per-row inversion dominated
    # the original row loop (one ~96-modmul Fermat power per row; now one
    # for the whole circuit).  The reference batches here too
    # (plonky2/src/plonk/prover.rs:555-674 uses batch_multiplicative_inverse
    # per chunk).
    denoms = []
    for last_lu, last_lut, first_lut in prover_data.lookup_rows:
        for row in range(first_lut, last_lut - 1, -1):
            denoms.extend(
                (d_alpha - (int(wv[LookupTableGate.wire_ith_looked_inp(s),
                                   row])
                            + d_a * int(wv[
                                LookupTableGate.wire_ith_looked_out(s),
                                row]))) % p
                for s in range(num_lut_slots))
        for row in range(last_lut - 1, last_lu - 1, -1):
            denoms.extend(
                (d_alpha - (int(wv[LookupGate.wire_ith_looking_inp(s), row])
                            + d_a * int(wv[
                                LookupGate.wire_ith_looking_out(s), row])))
                % p
                for s in range(num_lu_slots))
    all_inv = host.batch_inv(denoms, p)
    pos = 0

    # Pass 2 (sequential): the RE/SLDC running recurrences, identical row
    # order and update rules to the reference's backward scan.
    for last_lu, last_lut, first_lut in prover_data.lookup_rows:
        for row in range(first_lut, last_lut - 1, -1):
            inv = all_inv[pos:pos + num_lut_slots]
            pos += num_lut_slots
            lookup_combos = [
                (int(wv[LookupTableGate.wire_ith_looked_inp(s), row])
                 + d_b * int(wv[LookupTableGate.wire_ith_looked_out(s),
                                row])) % p
                for s in range(num_lut_slots)]
            new_re = polys[0][row + 1] if row + 1 < degree else 0
            for elt in lookup_combos:
                new_re = (new_re * d_delta + elt) % p
            polys[0][row] = new_re
            for slot in range(num_partial):
                if slot != 0:
                    prev = polys[slot][row]
                else:
                    prev = polys[num_partial][row + 1]
                s_lo = slot * max_lut_degree
                s_hi = min((slot + 1) * max_lut_degree, num_lut_slots)
                acc = prev
                for s in range(s_lo, s_hi):
                    acc = (acc + int(wv[
                        LookupTableGate.wire_ith_multiplicity(s), row])
                        * inv[s]) % p
                polys[slot + 1][row] = acc
        for row in range(last_lut - 1, last_lu - 1, -1):
            inv = all_inv[pos:pos + num_lu_slots]
            pos += num_lu_slots
            for slot in range(num_partial):
                if slot == 0:
                    prev = polys[num_partial][row + 1]
                else:
                    prev = polys[slot][row]
                s_lo = slot * max_lookup_degree
                s_hi = min((slot + 1) * max_lookup_degree, num_lu_slots)
                acc = sum(inv[s] for s in range(s_lo, s_hi)) % p
                polys[slot + 1][row] = (prev - acc) % p
    return polys


_LOOKUP_SCAN_CACHE = {}


def _lookup_section_prog(F, R1, R2, S_lut, S_lu, J, max_lut_degree,
                         max_lookup_degree):
    """Jitted device program for one lookup section (one LUT's row range).

    Replaces the reference's sequential backward row scan
    (plonky2/src/plonk/prover.rs:555-674) with TPU-native scans:
      - RE recurrence re <- re*delta + combo, flattened over (row, slot),
        is first-order affine with CONSTANT multiplier: per-row Horner
        (S_lut static muls) gives B_r, then re_r = delta^S * re_{r-1} + B_r
        runs as a log-depth lax.associative_scan.
      - Slot denominators invert via the vectorized Fermat chain (one
        ~100-multiply program over the whole (rows, slots) block — the
        device analog of the reference's batch_multiplicative_inverse).
      - The SLDC running value is a pure prefix sum over flattened
        (row, partial-slot-group) increments: associative_scan with add.
    Challenges and seeds enter traced, so ONE compile per section shape
    serves every proof."""
    import functools

    def scalar(arr, i):
        return tree_map(lambda a: a[i], arr)

    def run(lut_inp, lut_out, lut_mult, lu_inp, lu_out, d4, seeds):
        d_a, d_b, d_alpha, d_delta = (scalar(d4, i) for i in range(4))
        re_seed, sldc_seed = scalar(seeds, 0), scalar(seeds, 1)

        def affine_combine(x, y):
            # x_k = a_k x_{k-1} + b_k composed left-to-right
            a1, b1 = x
            a2, b2 = y
            return F.mul(a1, a2), F.add(F.mul(b1, a2), b2)

        # ---- RE over LUT rows ----
        combos = F.add(lut_inp, F.mul(d_b, lut_out))       # (R1, S_lut)
        B = F.zeros((R1,))
        A = F.ones(())
        for s in range(S_lut):
            B = F.add(F.mul(B, d_delta), combos[:, s])
            A = F.mul(A, d_delta)
        # seed folds into the first element: b0' = A*seed + b0
        B = tree_map(lambda full, first: full.at[0].set(first),
                     B, F.add(F.mul(A, re_seed), B[0]))
        a_vec = tree_map(lambda a: jnp.broadcast_to(a, (R1,)
                                                    + a.shape), A)
        _, re_vals = jax.lax.associative_scan(affine_combine, (a_vec, B),
                                              axis=0)

        # ---- SLDC increments ----
        lut_inv = F.inv(F.sub(d_alpha,
                              F.add(lut_inp, F.mul(d_a, lut_out))))
        lu_inv = F.inv(F.sub(d_alpha, F.add(lu_inp, F.mul(d_a, lu_out))))
        mi = F.mul(lut_mult, lut_inv)                       # (R1, S_lut)

        def group_sums(vals, S, gdeg, negate):
            cols = []
            for j in range(J):
                s_lo, s_hi = j * gdeg, min((j + 1) * gdeg, S)
                if s_lo >= s_hi:
                    g = F.zeros((vals.shape[0],))
                else:
                    g = F.batch_sum(vals[:, s_lo:s_hi], axis=-1)
                cols.append(F.neg(g) if negate else g)
            return cols

        inc_lut = group_sums(mi, S_lut, max_lut_degree, False)
        inc_lu = group_sums(lu_inv, S_lu, max_lookup_degree, True)

        def stack_cols(cols):
            # J column vectors (R,) -> (R*J,) in (row, j) scan order
            return tree_map(lambda *ls: jnp.stack(ls, axis=1).reshape(-1),
                            *cols)

        # flatten in scan order: all (row, j) of LUT rows, then LU rows
        flat = fftm.tconcat(
            [stack_cols(inc_lut)] +
            ([stack_cols(inc_lu)] if R2 else []), axis=0)
        prefix = jax.lax.associative_scan(F.add, flat, axis=0)
        sldc_vals = F.add(prefix, sldc_seed)
        return re_vals, sldc_vals

    return jax.jit(run)


def compute_lookup_polys_batched(common, prover_data, witness, deltas4):
    """Device-batched compute_lookup_polys: bit-identical to the host
    scalar reference (tests/test_lookups.py cross-checks)."""
    from ..gates.lookup_gates import LookupGate, LookupTableGate
    F = gl_mod if common.spec.name == "goldilocks" else _bb_mod()
    degree = common.degree
    num_lu_slots = LookupGate.num_slots_of(common.config)
    max_lookup_degree = common.config.max_quotient_degree_factor - 1
    num_partial = -(-num_lu_slots // max_lookup_degree)
    num_lut_slots = LookupTableGate.num_slots_of(common.config)
    max_lut_degree = -(-num_lut_slots // num_partial)
    wv = witness

    lut_inp_w = [LookupTableGate.wire_ith_looked_inp(s)
                 for s in range(num_lut_slots)]
    lut_out_w = [LookupTableGate.wire_ith_looked_out(s)
                 for s in range(num_lut_slots)]
    lut_mult_w = [LookupTableGate.wire_ith_multiplicity(s)
                  for s in range(num_lut_slots)]
    lu_inp_w = [LookupGate.wire_ith_looking_inp(s)
                for s in range(num_lu_slots)]
    lu_out_w = [LookupGate.wire_ith_looking_out(s)
                for s in range(num_lu_slots)]

    d4 = F.from_ints(np.array([d % common.spec.p for d in deltas4],
                              dtype=np.uint64))
    polys = np.zeros((num_partial + 1, degree), dtype=np.uint64)
    for last_lu, last_lut, first_lut in prover_data.lookup_rows:
        rows_lut = np.arange(first_lut, last_lut - 1, -1)
        rows_lu = np.arange(last_lut - 1, last_lu - 1, -1)
        R1, R2 = len(rows_lut), len(rows_lu)
        key = (F.SPEC.name, R1, R2, num_lut_slots, num_lu_slots,
               num_partial, max_lut_degree, max_lookup_degree)
        prog = _LOOKUP_SCAN_CACHE.get(key)
        if prog is None:
            prog = _lookup_section_prog(F, R1, R2, num_lut_slots,
                                        num_lu_slots, num_partial,
                                        max_lut_degree, max_lookup_degree)
            _LOOKUP_SCAN_CACHE[key] = prog
        re_seed = int(polys[0][first_lut + 1]) if first_lut + 1 < degree \
            else 0
        sldc_seed = int(polys[num_partial][first_lut + 1]) \
            if first_lut + 1 < degree else 0
        re_vals, sldc_vals = prog(
            F.from_ints(wv[np.ix_(lut_inp_w, rows_lut)].T),
            F.from_ints(wv[np.ix_(lut_out_w, rows_lut)].T),
            F.from_ints(wv[np.ix_(lut_mult_w, rows_lut)].T),
            F.from_ints(wv[np.ix_(lu_inp_w, rows_lu)].T
                        if R2 else np.zeros((0, num_lu_slots),
                                            dtype=np.uint64)),
            F.from_ints(wv[np.ix_(lu_out_w, rows_lu)].T
                        if R2 else np.zeros((0, num_lu_slots),
                                            dtype=np.uint64)),
            d4, F.from_ints(np.array([re_seed, sldc_seed],
                                     dtype=np.uint64)))
        polys[0][rows_lut] = F.to_ints(re_vals)
        sldc = F.to_ints(sldc_vals)
        sldc_lut = sldc[:R1 * num_partial].reshape(R1, num_partial)
        sldc_lu = sldc[R1 * num_partial:].reshape(R2, num_partial)
        for j in range(num_partial):
            polys[j + 1][rows_lut] = sldc_lut[:, j]
            if R2:
                polys[j + 1][rows_lu] = sldc_lu[:, j]
    return list(polys)


def _bb_mod():
    from ..field import bb
    return bb


def _scalars(F, values: Sequence[int]):
    """Host challenge ints -> list of traced scalar field values."""
    arr = F.from_ints(np.fromiter((int(v) for v in values), dtype=np.uint64,
                                  count=len(values)))
    return [tree_map(lambda a: a[i], arr) for i in range(len(values))]


def _ext_scalar(F, value: Tuple[int, ...]):
    """Host ext tuple -> tuple of scalar field values (device ext scalar)."""
    return tuple(tree_map(lambda a: a[0], F.from_ints(np.array([v],
                 dtype=np.uint64))) for v in value)


class ProverKernels:
    """Per-circuit compiled device programs + circuit-static device data."""

    def __init__(self, prover_data, common, F, hasher):
        self.F = F
        self.E = _ext_ops(F)
        self.common = common
        spec = common.spec
        p = spec.p
        config = common.config
        degree = common.degree
        num_routed = config.num_routed_wires

        # circuit-static device data
        self.sigmas_dev = F.from_ints(prover_data.sigmas)
        xs = F.from_ints(np.fromiter((int(x) for x in prover_data.subgroup),
                                     dtype=np.uint64, count=degree))
        k_arr = F.from_ints(np.fromiter((int(k) for k in common.k_is),
                                        dtype=np.uint64, count=num_routed))
        self.s_id = F.mul(tree_map(lambda a: a[:, None], k_arr),
                          tree_map(lambda a: a[None, :], xs))

        qdf = common.quotient_degree_factor
        qdb = host.log2_ceil(qdf)
        self.qdb = qdb
        rate_bits = config.fri_config.rate_bits
        assert qdb <= rate_bits
        self.step = 1 << (rate_bits - qdb)
        self.next_step = 1 << qdb
        m = 1 << (common.degree_bits + qdb)
        self.m = m

        w = spec.two_adic_generator(common.degree_bits + qdb)
        points = fftm.powers(F, w, m)
        self.shifted_xs = F.mul_const(points, spec.coset_shift)

        n = degree
        tau = pow(w, n, p)
        gf_n = pow(spec.coset_shift, n, p)
        zh_small = [(gf_n * pow(tau, i, p) - 1) % p for i in range(1 << qdb)]
        self.zh_inv = F.from_ints(np.tile(
            np.array(host.batch_inv(zh_small, p), dtype=np.uint64),
            m >> qdb))
        zh = F.from_ints(np.tile(np.array(zh_small, dtype=np.uint64),
                                 m >> qdb))
        x_minus_1 = F.add(self.shifted_xs, F.full((), p - 1))
        # one-time per circuit; Fermat inverse on device
        self.l_0 = F.mul(zh, F.inv(F.mul_const(x_minus_1, n % p)))

        # Circuit-static device data enters the jitted programs as ARGUMENTS
        # (not closure constants), so the persistent compile cache hits
        # across circuits with the same shapes/gate sets.
        self.pp_fn = lambda routed, betas, gammas: _pp_jit(
            F, common.quotient_degree_factor, common.num_partial_products,
            common.config.num_routed_wires, common.config.num_challenges,
            routed, betas, gammas, self.s_id, self.sigmas_dev)
        self.quotient_fn = (
            lambda cs, wires, zs_pp, pi, betas, gammas, alphas, deltas,
            lut_re: _quotient_split(
                F, common, cs, wires, zs_pp, pi, betas, gammas, alphas,
                deltas, lut_re, self.shifted_xs, self.l_0, self.zh_inv,
                self.step, self.next_step, self.m))


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _pp_jit(F, qdf, num_prods, num_routed, num_challenges, routed,
            betas_arr, gammas_arr, s_id, sigmas_dev):
    """Partial products / Z columns (reference prover.rs:449-546).
    Circuit-static data (s_id, sigmas) are traced inputs so one compilation
    serves every circuit with matching shapes.  All reductions are tree/scan
    shaped (log-depth graphs): unrolled multiply chains make LLVM compile
    time superlinear on XLA:CPU."""
    n = fftm.tshape(routed)[-1]
    nchunks = -(-num_routed // qdf)
    zs, pps = [], []
    any_zero = jnp.zeros((), bool)
    for i in range(num_challenges):
        beta = tree_map(lambda a: a[i], betas_arr)
        gamma = tree_map(lambda a: a[i], gammas_arr)
        numer = F.add(F.add(routed, F.mul(s_id, beta)), gamma)
        denom = F.add(F.add(routed, F.mul(sigmas_dev, beta)), gamma)
        any_zero = any_zero | F.is_zero(denom).any()
        quot = F.mul(numer, F.inv(denom))
        pad = nchunks * qdf - num_routed
        if pad:
            quot = fftm.tconcat([quot, F.ones((pad, n))], axis=0)
        chunked = tree_map(lambda a: a.reshape(nchunks, qdf, n), quot)
        chunk_prods = F.batch_prod(chunked, axis=1)       # (nchunks, n)
        row_prod = F.batch_prod(chunk_prods, axis=0)      # (n,)
        incl = F.cumprod(row_prod, axis=-1)
        z = fftm.tconcat([F.ones((1,)),
                          tree_map(lambda a: a[..., :-1], incl)], axis=-1)
        zs.append(tree_map(lambda a: a[None, :], z))
        # partial products: acc_k = z * prod_{j<=k} chunk_prods[j]
        running = F.cumprod(chunk_prods, axis=0)
        accs = F.mul(tree_map(lambda a: a[:num_prods], running),
                     tree_map(lambda a: a[None, :], z))
        pps.append(accs)
    batch = fftm.tconcat(zs + pps, axis=0)
    return batch, any_zero


def _quotient_body(F, common, cs_lde, wires_lde, zs_pp_lde, pi_hash_arr,
                   betas_arr, gammas_arr, alphas_arr, deltas_arr,
                   lut_re_arr, shifted_xs, l_0, step, next_step, m):
    """Whole-domain vanishing "rest" evaluation (z1/partial-product/lookup
    terms; reference prover.rs:690-926).  Gate constraint terms are computed
    by the per-gate split programs (_gate_contrib_body)."""
    config = common.config
    qdf = common.quotient_degree_factor
    n = common.degree

    def strided(lde):
        return tree_map(lambda a: a[:, ::step], lde)

    cs = strided(cs_lde)
    wires = strided(wires_lde)
    zs_pp = strided(zs_pp_lde)
    zs_pp_next = tree_map(lambda a: jnp.roll(a, -next_step, axis=-1), zs_pp)

    def rows(batch, lo, hi):
        return [tree_map(lambda a, j=j: a[j], batch) for j in range(lo, hi)]

    c0, c1 = common.constants_range()
    s0, s1 = common.sigmas_range()
    z0, z1 = common.zs_range()
    pp0, pp1 = common.partial_products_range()

    A = DeviceBaseAlgebra(F, m)
    nch = config.num_challenges
    vars = EvaluationVars(
        rows(cs, c0, c1), rows(wires, 0, config.num_wires),
        [tree_map(lambda a, i=i: a[i], pi_hash_arr)
         for i in range(common.spec.num_hash_out_elts)])
    vars.stacked_wires = wires
    betas = [tree_map(lambda a, i=i: a[i], betas_arr) for i in range(nch)]
    gammas = [tree_map(lambda a, i=i: a[i], gammas_arr) for i in range(nch)]
    alphas = [tree_map(lambda a, i=i: a[i], alphas_arr) for i in range(nch)]
    has_lookup = common.num_lookup_polys != 0
    deltas = []
    lut_re = []
    local_lk = []
    next_lk = []
    if has_lookup:
        deltas = [tree_map(lambda a, i=i: a[i], deltas_arr)
                  for i in range(4 * nch)]
        nluts = len(common.luts)
        lut_re = [[tree_map(lambda a, k=k, i=i: a[i * nluts + k], lut_re_arr)
                   for k in range(nluts)] for i in range(nch)]
        lk0 = common.num_zs_partial_products_polys()
        lk1 = lk0 + common.num_all_lookup_polys()
        local_lk = rows(zs_pp, lk0, lk1)
        next_lk = rows(zs_pp_next, lk0, lk1)

    # "rest" terms only: z1 + partial-product + lookup terms; the gate
    # constraint terms come from the per-gate split programs below (bounded
    # XLA graphs: the monolithic all-gates graph compiled for ~50 min / 22 GB
    # at recursion-config gate sets on 1-core XLA:CPU).
    rest_values = vanishing.eval_vanishing_poly(
        A, common, shifted_xs, l_0, vars,
        rows(zs_pp, z0, z1), rows(zs_pp_next, z0, z1),
        rows(zs_pp, pp0, pp1), rows(cs, s0, s1), betas, gammas, alphas,
        deltas=deltas, local_lookup_zs=local_lk, next_lookup_zs=next_lk,
        lut_re_evals=lut_re, include_gate_constraints=False)
    return _stack_ch(rest_values)


def _stack_ch(values):
    return tree_map(lambda *xs: jnp.stack(xs, axis=0), *values)


def _scalar_pow(F, base, e: int):
    """base^e for a traced scalar and static exponent (square-and-multiply;
    e is small — the alpha offset)."""
    result = None
    while e:
        if e & 1:
            result = base if result is None else F.mul(result, base)
        e >>= 1
        if e:
            base = F.mul(base, base)
    return result if result is not None else F.ones(())


def _gate_contrib_body(F, common, gi, offset, cs_lde, wires_lde,
                       pi_hash_arr, alphas_arr, step, m):
    """One gate type's alpha-combined, filtered constraint contribution over
    the quotient domain: filt_g * alpha^offset * sum_k alpha^k c_{g,k}
    per challenge.  Exact mod-p algebra makes the split bit-identical to the
    monolithic evaluation; each program is bounded by ONE gate's constraint
    size and its compilation is shared by every circuit using the gate with
    the same selector layout."""
    from ..gates.base import compute_filter, eval_filtered

    config = common.config

    def strided(lde):
        return tree_map(lambda a: a[:, ::step], lde)

    def rows(batch, lo, hi):
        return [tree_map(lambda a, j=j: a[j], batch) for j in range(lo, hi)]

    cs = strided(cs_lde)
    wires = strided(wires_lde)
    c0, c1 = common.constants_range()
    A = DeviceBaseAlgebra(F, m)
    vars = EvaluationVars(
        rows(cs, c0, c1), rows(wires, 0, config.num_wires),
        [tree_map(lambda a, i=i: a[i], pi_hash_arr)
         for i in range(common.spec.num_hash_out_elts)])
    vars.stacked_wires = wires

    gate = common.gates[gi]
    sel_idx = common.selectors_info.selector_indices[gi]
    group = common.selectors_info.groups[sel_idx]
    ns = common.selectors_info.num_selectors
    dev = getattr(gate, "eval_unfiltered_device", None)
    if dev is not None:
        filt = compute_filter(A, gi, group, vars.local_constants[sel_idx],
                              ns > 1)
        cs_list = [A.mul(filt, c) for c in dev(F, wires, vars)]
    else:
        cs_list = [A.zero()] * gate.num_constraints()
        eval_filtered(A, gate, vars, gi, sel_idx, group, ns,
                      common.num_lookup_selectors, cs_list)

    nch = config.num_challenges
    npts = fftm.tshape(wires)[-1]
    out = []
    for i in range(nch):
        alpha = tree_map(lambda a: a[i], alphas_arr)
        comb = vanishing.reduce_with_powers(A, cs_list, alpha)
        comb = F.mul(comb, _scalar_pow(F, alpha, offset))
        # a gate whose constraints are all constant-valued (e.g. zero
        # constraints) yields a scalar; broadcast so the finish-stage
        # accumulation always sees (nch, npoints)
        comb = tree_map(lambda a: jnp.broadcast_to(a, (npts,)), comb)
        out.append(comb)
    return _stack_ch(out)


def _quotient_finish_body(F, common, zh_inv, rest_stack, *contribs):
    """total = rest + sum(gate contributions); divide by Z_H; coset-IFFT;
    split into degree-n chunks (reference prover.rs:909-925)."""
    qdf = common.quotient_degree_factor
    n = common.degree
    total = rest_stack
    for c in contribs:
        total = F.add(total, c)
    nch = common.config.num_challenges
    chunks = []
    for i in range(nch):
        v = tree_map(lambda a: a[i], total)
        q_values = F.mul(v, zh_inv)
        q_coeffs = fftm.coset_ifft(F, q_values, common.spec.coset_shift)
        qd = common.quotient_degree
        q_coeffs = tree_map(lambda a: a[:qd], q_coeffs)
        chunks.append(tree_map(lambda a: a.reshape(qdf, n), q_coeffs))
    return tree_map(lambda *cs_: jnp.concatenate(cs_, axis=0), *chunks)


# common is unhashable per-instance; cache jitted programs per (common id,
# stage) — the per-gate programs additionally dedupe on the gate identity,
# so circuits sharing gate types share compilations
_QUOTIENT_JITS = {}


def _quotient_split_fns(F, common):
    key = id(common)
    fns = _QUOTIENT_JITS.get(key)
    if fns is None:
        rest = jax.jit(_partial(_quotient_body, F, common),
                       static_argnums=(11, 12, 13))
        offset = vanishing.count_rest_terms(common)
        gate_fns = {}
        for gi in range(len(common.gates)):
            gate_fns[gi] = jax.jit(
                _partial(_gate_contrib_body, F, common, gi, offset),
                static_argnums=(4, 5))
        finish = jax.jit(_partial(_quotient_finish_body, F, common))
        fns = (rest, gate_fns, finish)
        _QUOTIENT_JITS[key] = fns
    return fns


def _quotient_split(F, common, cs, wires, zs_pp, pi, betas, gammas, alphas,
                    deltas, lut_re, shifted_xs, l_0, zh_inv, step,
                    next_step, m):
    rest, gate_fns, finish = _quotient_split_fns(F, common)
    rest_stack = rest(cs, wires, zs_pp, pi, betas, gammas, alphas, deltas,
                      lut_re, shifted_xs, l_0, step, next_step, m)
    contribs = [gate_fns[gi](cs, wires, pi, alphas, step, m)
                for gi in range(len(common.gates))]
    return finish(zh_inv, rest_stack, *contribs)


def _kernels(prover_data, common, F, hasher) -> ProverKernels:
    k = getattr(prover_data, "_kernels", None)
    if k is None:
        k = ProverKernels(prover_data, common, F, hasher)
        prover_data._kernels = k
    return k


def _internal_prove(prover_data, common, wires_values,
                    witness: np.ndarray, public_inputs: List[int], F,
                    hasher, inner_hasher=None, timing=None
                    ) -> ProofWithPublicInputs:
    """``wires_values``: dense (num_wires, degree) device matrix;
    ``witness``: the host matrix (lookup circuits only, else None)."""
    spec = common.spec
    config = common.config
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    num_challenges = config.num_challenges
    degree = common.degree

    kern = _kernels(prover_data, common, F, hasher)
    # PI hash is always the algebraic InnerHasher (reference prover.rs:244)
    public_inputs_hash = (inner_hasher or hasher).hash_no_pad_host(
        public_inputs)

    zk = config.zero_knowledge   # oracle blinding flags, plonk_common.rs:24-40
    with timed(timing, "compute wire polynomials + commit"):
        wires_commitment = PolynomialBatch.from_values(
            F, wires_values, rate_bits, cap_height, hasher=hasher,
            blinding=zk)
        wires_commitment.cap_host()   # blocking read = phase boundary

    challenger = Challenger(spec=spec, permute=hasher.permute_host,
                            width=hasher.WIDTH, rate=hasher.RATE)
    challenger.observe_hash(prover_data.circuit_digest)
    challenger.observe_hash(public_inputs_hash)
    challenger.observe_cap(wires_commitment.cap_host())

    betas = challenger.get_n_challenges(num_challenges)
    gammas = challenger.get_n_challenges(num_challenges)

    has_lookup = common.num_lookup_polys != 0
    deltas = []
    if has_lookup:
        # reuse betas and gammas as the first deltas
        # (reference prover.rs:283-299)
        additional = challenger.get_n_challenges(2 * num_challenges)
        deltas = list(betas) + list(gammas) + additional

    def to_arr(vals):
        return F.from_ints(np.fromiter((int(v) for v in vals),
                                       dtype=np.uint64, count=max(len(vals),
                                                                  0)))

    with timed(timing, "compute partial products"):
        routed = tree_map(lambda a: a[:config.num_routed_wires],
                          wires_values)
        zs_partial_products, any_zero = kern.pp_fn(routed, to_arr(betas),
                                                   to_arr(gammas))
        if bool(jax.device_get(any_zero)):
            raise InvZeroPermArg()

    lut_re_evals = []
    if has_lookup:
        import jax.numpy as jnp
        lookup_cols = []
        for i in range(num_challenges):
            lookup_cols.extend(compute_lookup_polys(
                common, prover_data, witness, deltas[4 * i:4 * (i + 1)]))
        lookup_arr = F.from_ints(np.array(lookup_cols, dtype=np.uint64))
        zs_partial_products = tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0),
            zs_partial_products, lookup_arr)
        lut_re_evals = vanishing.get_lut_re_evals(common, deltas)

    with timed(timing, "commit to partial products and Z's"):
        zs_pp_commitment = PolynomialBatch.from_values(
            F, zs_partial_products, rate_bits, cap_height, hasher=hasher,
            blinding=zk)
        challenger.observe_cap(zs_pp_commitment.cap_host())

    alphas = challenger.get_n_challenges(num_challenges)

    flat_lut_re = [v for evs in lut_re_evals for v in evs]
    with timed(timing, "compute quotient polys"):
        quotient_chunks = kern.quotient_fn(
            prover_data.constants_sigmas_commitment.lde,
            wires_commitment.lde, zs_pp_commitment.lde,
            to_arr(public_inputs_hash), to_arr(betas), to_arr(gammas),
            to_arr(alphas), to_arr(deltas), to_arr(flat_lut_re))
        if timing is not None:
            # attribute quotient device time here rather than at the next
            # blocking fetch (the commit's cap read)
            jax.block_until_ready(jax.tree_util.tree_leaves(quotient_chunks))

    with timed(timing, "commit to quotient polys"):
        quotient_commitment = PolynomialBatch(
            F, quotient_chunks, rate_bits, cap_height, hasher=hasher,
            blinding=zk)
        challenger.observe_cap(quotient_commitment.cap_host())

    zeta = challenger.get_extension_challenge()
    zeta_pow_n = host.ext_pow(spec, zeta, degree)
    assert zeta_pow_n != host.ext_one(spec), "opening point is in subgroup"

    oracles = [prover_data.constants_sigmas_commitment, wires_commitment,
               zs_pp_commitment, quotient_commitment]

    with timed(timing, "construct the opening set"):
        openings = _opening_set(F, common, zeta, oracles)
        fri_openings = openings.to_fri_openings()
    for batch_vals in fri_openings:
        challenger.observe_extension_elements(batch_vals)

    instance = common.get_fri_instance(zeta)
    for batch, vals in zip(instance.batches, fri_openings):
        batch.values = vals

    with timed(timing, "compute opening proofs"):
        opening_proof = fri_prover.prove_openings(
            F, instance, oracles, challenger, common.fri_params, hasher)

    proof = Proof(
        wires_cap=wires_commitment.cap_host(),
        plonk_zs_partial_products_cap=zs_pp_commitment.cap_host(),
        quotient_polys_cap=quotient_commitment.cap_host(),
        openings=openings,
        opening_proof=opening_proof)
    return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)


# -- openings (reference plonk/proof.rs:347-386) ------------------------------


def _ext_powers_traced(E, zeta_dev, n: int):
    """[1, z, ..., z^(n-1)] as traced device ext arrays via log-doubling
    (pows_{2L} = pows_L ++ pows_L * z^L, z^{2L} = (z^L)^2) — must run inside
    a jitted program: eagerly through the TPU tunnel every jnp primitive is
    a separate RPC, which made the opening phase take ~14 s/proof."""
    pows = E.ones((1,))
    z_pow = zeta_dev                       # ext scalar, shapes ()
    length = 1
    while length < n:
        shifted = E.mul(pows, z_pow)
        pows = tuple(fftm.tconcat([a, b], axis=-1)
                     for a, b in zip(pows, shifted))
        z_pow = E.mul(z_pow, z_pow)
        length *= 2
    return tuple(tree_map(lambda a: a[:n], c) for c in pows)


@_partial(jax.jit, static_argnums=(0, 1))
def _eval_commitments_jit(F, point_ids, coeff_batches, points):
    """ONE program: each coeff batch (P_i, n) evaluated at its opening point.

    point_ids: static tuple, per batch an index into ``points`` (traced ext
    scalars).  Returns per batch a tuple of D (P_i,) arrays.
    """
    E = _ext_ops(F)
    n = fftm.tshape(coeff_batches[0])[-1]
    pows_cache = {}
    outs = []
    for pid, coeffs in zip(point_ids, coeff_batches):
        if pid not in pows_cache:
            pows_cache[pid] = _ext_powers_traced(E, points[pid], n)
        pows = pows_cache[pid]
        evals = []
        for d in range(E.D):
            prod = F.mul(coeffs, tree_map(lambda a: a[None, :], pows[d]))
            evals.append(F.batch_sum(prod, axis=-1))
        outs.append(tuple(evals))
    return tuple(outs)


def _ext_scalar_dev(F, value):
    arr = F.from_ints(np.array(list(value), dtype=np.uint64))
    return tuple(tree_map(lambda a: a[d], arr) for d in range(len(value)))


def eval_commitment_at(F, zeta, batch: PolynomialBatch) -> List[Tuple]:
    """Horner-free batched evaluation of every poly of a commitment at an
    extension point: coeffs (P, n) dot ext-powers (n,) (reference
    proof.rs:359-364 does a parallel per-poly Horner)."""
    E = _ext_ops(F)
    (evals,) = _eval_commitments_jit(
        F, (0,), (batch.coeffs,), (_ext_scalar_dev(F, zeta),))
    host_vals = [F.to_ints(c) for c in evals]
    num_polys = fftm.tshape(batch.coeffs)[0]
    return [tuple(int(host_vals[d][i]) for d in range(E.D))
            for i in range(num_polys)]


def _opening_set(F, common, zeta, oracles) -> OpeningSet:
    spec = common.spec
    g = spec.two_adic_generator(common.degree_bits)
    zeta_next = host.ext_scalar_mul(spec, zeta, g)
    constants_sigmas, wires, zs_pp, quotient = oracles

    E = _ext_ops(F)
    points = (_ext_scalar_dev(F, zeta), _ext_scalar_dev(F, zeta_next))
    all_evals = _eval_commitments_jit(
        F, (0, 0, 0, 1, 0),
        (constants_sigmas.coeffs, wires.coeffs, zs_pp.coeffs, zs_pp.coeffs,
         quotient.coeffs),
        points)
    # ONE stacked fetch for every opening value
    flat = [a for evals in all_evals for a in evals]
    widths = [fftm.tshape(a)[0] for a in flat]
    stacked = F.to_ints(tree_map(
        lambda *ls: jnp.concatenate(ls, axis=0), *flat))
    pieces = []
    off = 0
    for w in widths:
        pieces.append(stacked[off:off + w])
        off += w
    it = iter(range(len(flat)))

    def unpack(evals):
        idxs = [next(it) for _ in range(E.D)]
        num = len(pieces[idxs[0]])
        return [tuple(int(pieces[i][j]) for i in idxs) for j in range(num)]

    cs_eval = unpack(all_evals[0])
    wires_eval = unpack(all_evals[1])
    zs_pp_eval = unpack(all_evals[2])
    zs_pp_next_eval = unpack(all_evals[3])
    quotient_eval = unpack(all_evals[4])

    c0, c1 = common.constants_range()
    s0, s1 = common.sigmas_range()
    z0, z1 = common.zs_range()
    pp0, pp1 = common.partial_products_range()
    lk0 = common.num_zs_partial_products_polys()

    return OpeningSet(
        constants=cs_eval[c0:c1],
        plonk_sigmas=cs_eval[s0:s1],
        wires=wires_eval,
        plonk_zs=zs_pp_eval[z0:z1],
        plonk_zs_next=zs_pp_next_eval[z0:z1],
        partial_products=zs_pp_eval[pp0:pp1],
        quotient_polys=quotient_eval,
        lookup_zs=zs_pp_eval[lk0:],
        lookup_zs_next=zs_pp_next_eval[lk0:])
