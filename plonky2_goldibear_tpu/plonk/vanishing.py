"""Vanishing-polynomial evaluation
(reference plonky2/src/plonk/vanishing_poly.rs:57-180,700-780,
util/partial_products.rs:53-80, plonk/plonk_common.rs:52-70,105-135).

One generic implementation over an algebra object ``A`` (see gates/base.py)
covers both the verifier's extension-point evaluation (``eval_vanishing_poly``)
and the prover's whole-domain batched evaluation
(``eval_vanishing_poly_base_batch``) — on TPU the batch is the entire
quotient domain in one kernel rather than 32-point chunks.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..gates.base import (DeviceBaseAlgebra, EvaluationVars, compute_filter,
                          eval_filtered)

tree_map = jax.tree_util.tree_map


def _stack_rows(terms: Sequence):
    """Stack a list of same-shaped field values into one leading axis."""
    return tree_map(lambda *xs: jnp.stack(xs, axis=0), *terms)


def _row(batch, k: int):
    return tree_map(lambda a: a[k], batch)


def _tree_prod(A, terms: Sequence):
    """Product of a list of algebra values; log-depth on device."""
    terms = list(terms)
    if not terms:
        return A.one()
    if isinstance(A, DeviceBaseAlgebra) and len(terms) > 2:
        return A.F.batch_prod(_stack_rows(terms), axis=0)
    acc = None
    for t in terms:
        acc = t if acc is None else A.mul(acc, t)
    return acc


def _leave_one_out_sum(A, terms: Sequence, weights: Sequence = None):
    """sum_i w_i * prod_{j != i} terms[j] (w_i = 1 when weights is None).

    Device path: exclusive prefix x exclusive suffix cumprods — two scans
    instead of an O(k^2) unrolled multiply graph; exact same field values
    (no division tricks, so zero factors are handled correctly)."""
    terms = list(terms)
    if not terms:
        return A.zero()
    if isinstance(A, DeviceBaseAlgebra) and len(terms) > 2:
        F = A.F
        stacked = _stack_rows(terms)                     # (k, ...)
        leaf = jax.tree_util.tree_leaves(stacked)[0]
        one_row = F.ones((1,) + leaf.shape[1:])
        pre = F.cumprod(stacked, axis=0)
        pre_ex = tree_map(lambda o, a: jnp.concatenate([o, a[:-1]], axis=0),
                          one_row, pre)
        rev = tree_map(lambda a: a[::-1], stacked)
        suf = F.cumprod(rev, axis=0)
        suf_ex = tree_map(lambda o, a: jnp.concatenate([o, a[:-1]], axis=0),
                          one_row, suf)
        suf_ex = tree_map(lambda a: a[::-1], suf_ex)
        loo = F.mul(pre_ex, suf_ex)                      # (k, ...)
        if weights is not None:
            loo = F.mul(loo, _stack_rows(list(weights)))
        return F.batch_sum(loo, axis=0)
    acc = None
    for i in range(len(terms)):
        t = _tree_prod(A, [terms[j] for j in range(len(terms)) if j != i])
        if weights is not None:
            t = A.mul(weights[i], t)
        acc = t if acc is None else A.add(acc, t)
    return acc


def evaluate_gate_constraints(A, common, vars: EvaluationVars) -> List:
    """reference vanishing_poly.rs:703-738: sum of filtered constraints of
    every gate, indexed by constraint position.

    On the device path, gates exposing ``eval_unfiltered_device`` (a
    scan/matmul formulation over the stacked wire array — same values, same
    order, ~30x smaller XLA graph) are preferred over the generic per-op
    trace.
    """
    constraints = [A.zero()] * common.num_gate_constraints
    stacked = getattr(vars, "stacked_wires", None)
    for i, gate in enumerate(common.gates):
        sel_idx = common.selectors_info.selector_indices[i]
        group = common.selectors_info.groups[sel_idx]
        num_selectors = common.selectors_info.num_selectors
        dev = getattr(gate, "eval_unfiltered_device", None)
        if (dev is not None and stacked is not None
                and isinstance(A, DeviceBaseAlgebra)):
            filt = compute_filter(A, i, group,
                                  vars.local_constants[sel_idx],
                                  num_selectors > 1)
            for j, c in enumerate(dev(A.F, stacked, vars)):
                constraints[j] = A.mul_add(filt, c, constraints[j])
        else:
            # accumulates acc_j = filter*c_j + acc_j in place (the circuit
            # side emits one mul_add_extension per constraint, reference
            # gate.rs:239-242)
            eval_filtered(A, gate, vars, i, sel_idx, group,
                          num_selectors, common.num_lookup_selectors,
                          constraints)
    return constraints


def check_partial_products(A, numerators: Sequence, denominators: Sequence,
                           partials: Sequence, z_x, z_gx,
                           max_degree: int) -> List:
    """reference util/partial_products.rs:53-80.

    Device path: chunk products via log-depth tree reductions on stacked
    arrays (unrolled multiply chains are pathological for XLA:CPU compile
    time); values are identical — field reassociation is exact."""
    n = len(numerators)
    nchunks = -(-n // max_degree)
    assert nchunks == len(partials) + 1
    if isinstance(A, DeviceBaseAlgebra) and n > 4:
        F = A.F
        pad = nchunks * max_degree - n
        leaf_shape = jax.tree_util.tree_leaves(numerators[0])[0].shape
        ones = [F.ones(leaf_shape)] * pad
        nums = _stack_rows(list(numerators) + ones)
        dens = _stack_rows(list(denominators) + ones)
        nums = tree_map(lambda a: a.reshape((nchunks, max_degree)
                                            + a.shape[1:]), nums)
        dens = tree_map(lambda a: a.reshape((nchunks, max_degree)
                                            + a.shape[1:]), dens)
        num_prods = F.batch_prod(nums, axis=1)    # (nchunks, ...)
        den_prods = F.batch_prod(dens, axis=1)
        prev = _stack_rows([z_x] + list(partials))
        nxt = _stack_rows(list(partials) + [z_gx])
        out_batch = F.sub(F.mul(prev, num_prods), F.mul(nxt, den_prods))
        return [_row(out_batch, k) for k in range(nchunks)]
    accs = [z_x] + list(partials) + [z_gx]
    out = []
    idx = 0
    chunk_i = 0
    while idx < n:
        hi = min(idx + max_degree, n)
        # full numerator product, then denominator product, then fused
        # prev*num - next*den (reference partial_products.rs:106-111 circuit
        # emission; value-identical for host/device algebras)
        num_prod = A.mul_many(numerators[idx:hi])
        den_prod = A.mul_many(denominators[idx:hi])
        prev_acc, next_acc = accs[chunk_i], accs[chunk_i + 1]
        next_acc_deno = A.mul(next_acc, den_prod)
        out.append(A.mul_sub(prev_acc, num_prod, next_acc_deno))
        idx = hi
        chunk_i += 1
    assert chunk_i == len(partials) + 1
    return out


def reduce_with_powers(A, terms: Sequence, alpha):
    """sum_i alpha^i terms[i] (reference plonk_common.rs:122-135 does a
    Horner chain); alpha is a base-field scalar (host int / traced device
    scalar).  Device path: stacked power-weighted tree sum — log-depth graph
    instead of an unrolled chain, identical field value."""
    terms = list(terms)
    if isinstance(A, DeviceBaseAlgebra) and len(terms) > 8:
        F = A.F
        C = len(terms)
        stacked = _stack_rows(terms)                       # (C, ...)
        alpha_b = tree_map(lambda a: jnp.broadcast_to(a, (C,)), alpha)
        pows = F.cumprod(alpha_b, axis=0)                  # [a, a^2, ..]
        pows = tree_map(
            lambda o, p: jnp.concatenate([o, p[:-1]], axis=0),
            F.ones((1,)), pows)                            # [1, a, ..]
        extra = jax.tree_util.tree_leaves(stacked)[0].ndim - 1
        pows = tree_map(lambda a: a.reshape((C,) + (1,) * extra), pows)
        return F.batch_sum(F.mul(stacked, pows), axis=0)
    cumul = A.zero()
    for term in reversed(terms):
        cumul = A.add(A.mul_scalar(cumul, alpha), term)
    return cumul


def get_lut_poly_coeffs(common, lut_index: int, delta_b: int) -> List[int]:
    """Host coefficients of the LUT polynomial: entries inp + B*out, padded
    with zeros to num_lut_slots*rows, then REVERSED (reference
    vanishing_poly.rs:31-52)."""
    from ..gates.lookup_gates import LookupTableGate
    p = common.spec.p
    lut = common.luts[lut_index]
    num_lut_slots = LookupTableGate.num_slots_of(common.config)
    rows = -(-len(lut) // num_lut_slots)
    degree = num_lut_slots * rows
    coeffs = [(inp + delta_b * out) % p for inp, out in lut]
    coeffs += [0] * (degree - len(coeffs))
    coeffs.reverse()
    return coeffs


def get_lut_re_evals(common, deltas: Sequence[int]) -> List[List[int]]:
    """Host: per challenge, per LUT, the RE-check value
    get_lut_poly(...).eval(delta) (reference prover.rs:757-784)."""
    p = common.spec.p
    out = []
    nch = common.config.num_challenges
    for i in range(nch):
        cur = deltas[4 * i:4 * (i + 1)]
        evals = []
        for li in range(len(common.luts)):
            coeffs = get_lut_poly_coeffs(common, li, cur[1])  # ChallengeB
            acc = 0
            for c in reversed(coeffs):
                acc = (acc * cur[3] + c) % p                  # ChallengeDelta
            evals.append(acc)
        out.append(evals)
    return out


def check_lookup_constraints(A, common, vars: EvaluationVars,
                             local_lookup_zs, next_lookup_zs,
                             lookup_selectors, deltas4, lut_re_evals) -> List:
    """logUp constraints for one challenge set (reference
    vanishing_poly.rs:370-535).  deltas4 = [A, B, Alpha, Delta] scalars;
    lut_re_evals = per-LUT scalar RE-check values."""
    from ..gates.lookup_gates import LookupGate, LookupTableGate
    from ..gates.selectors import (LOOKUP_SEL_INIT_SRE, LOOKUP_SEL_LAST_LDC,
                                   LOOKUP_SEL_START_END, LOOKUP_SEL_TRANS_LDC,
                                   LOOKUP_SEL_TRANS_SRE)
    num_lu_slots = LookupGate.num_slots_of(common.config)
    num_lut_slots = LookupTableGate.num_slots_of(common.config)
    lu_degree = common.quotient_degree_factor - 1
    num_sldc = len(local_lookup_zs) - 1
    lut_degree = -(-num_lut_slots // num_sldc)
    lw = vars.local_wires
    delta_a, delta_b, delta_alpha, _ = deltas4

    constraints = []
    z_re = local_lookup_zs[0]
    next_z_re = next_lookup_zs[0]
    z_x_sldcs = local_lookup_zs[1:]
    z_gx_sldcs = next_lookup_zs[1:]

    looked = [A.add(lw[LookupTableGate.wire_ith_looked_inp(s)],
                    A.mul_scalar(lw[LookupTableGate.wire_ith_looked_out(s)],
                                 delta_a))
              for s in range(num_lut_slots)]
    looking = [A.add(lw[LookupGate.wire_ith_looking_inp(s)],
                     A.mul_scalar(lw[LookupGate.wire_ith_looking_out(s)],
                                  delta_a))
               for s in range(num_lu_slots)]
    lookup_combos = [A.add(lw[LookupTableGate.wire_ith_looked_inp(s)],
                           A.mul_scalar(
                               lw[LookupTableGate.wire_ith_looked_out(s)],
                               delta_b))
                     for s in range(num_lut_slots)]
    # alpha - combo terms
    alpha_l = A.lift_scalar(delta_alpha)
    m_looked = [A.sub(alpha_l, c) for c in looked]
    m_looking = [A.sub(alpha_l, c) for c in looking]

    constraints.append(A.mul(lookup_selectors[LOOKUP_SEL_LAST_LDC],
                             z_x_sldcs[num_sldc - 1]))
    constraints.append(A.mul(lookup_selectors[LOOKUP_SEL_INIT_SRE],
                             z_x_sldcs[0]))
    constraints.append(A.mul(lookup_selectors[LOOKUP_SEL_INIT_SRE], z_re))

    for r in range(LOOKUP_SEL_START_END, common.num_lookup_selectors):
        re_eval = lut_re_evals[r - LOOKUP_SEL_START_END]
        constraints.append(A.mul(
            lookup_selectors[r],
            A.sub(z_re, A.lift_scalar(re_eval))))

    # RE row transition: Horner in delta == power-weighted sum of the
    # reversed combos with next_z_re as the leading term
    cur_sum = reduce_with_powers(
        A, list(reversed(lookup_combos)) + [next_z_re], deltas4[3])
    constraints.append(A.mul(lookup_selectors[LOOKUP_SEL_TRANS_SRE],
                             A.sub(z_re, cur_sum)))

    for poly in range(num_sldc):
        lut_rng = range(poly * lut_degree,
                        min((poly + 1) * lut_degree, num_lut_slots))
        lu_rng = range(poly * lu_degree,
                       min((poly + 1) * lu_degree, num_lu_slots))

        lut_prod = _tree_prod(A, [m_looked[i] for i in lut_rng])
        lu_prod = _tree_prod(A, [m_looking[i] for i in lu_rng])
        lu_sum_prods = _leave_one_out_sum(
            A, [m_looking[i] for i in lu_rng])
        lut_sum_prods_mul = _leave_one_out_sum(
            A, [m_looked[i] for i in lut_rng],
            weights=[lw[LookupTableGate.wire_ith_multiplicity(i)]
                     for i in lut_rng])

        prev = z_gx_sldcs[num_sldc - 1] if poly == 0 else z_x_sldcs[poly - 1]
        sum_trans = A.sub(A.mul(lut_prod, A.sub(z_x_sldcs[poly], prev)),
                          lut_sum_prods_mul)
        constraints.append(A.mul(lookup_selectors[LOOKUP_SEL_TRANS_SRE],
                                 sum_trans))
        ldc_trans = A.add(A.mul(lu_prod, A.sub(z_x_sldcs[poly], prev)),
                          lu_sum_prods)
        constraints.append(A.mul(lookup_selectors[LOOKUP_SEL_TRANS_LDC],
                                 ldc_trans))
    return constraints


def eval_vanishing_poly(A, common, x, l_0_x, vars: EvaluationVars,
                        local_zs: Sequence, next_zs: Sequence,
                        partial_products: Sequence, s_sigmas: Sequence,
                        betas: Sequence[int], gammas: Sequence[int],
                        alphas: Sequence[int], deltas: Sequence = (),
                        local_lookup_zs: Sequence = (),
                        next_lookup_zs: Sequence = (),
                        lut_re_evals: Sequence = (),
                        include_gate_constraints: bool = True) -> List:
    """Returns one combined value per alpha challenge
    (reference vanishing_poly.rs:57-180).

    x and every entry of vars/zs/sigmas are algebra values; betas, gammas,
    alphas and deltas are base-field *scalars* — host ints for the verifier,
    traced scalar device arrays for the prover (so challenge values stay out
    of the compiled graph).
    """
    max_degree = common.quotient_degree_factor
    num_prods = common.num_partial_products
    num_challenges = common.config.num_challenges
    num_routed = common.config.num_routed_wires
    has_lookup = common.num_lookup_polys != 0

    # gate terms sit at the END of the alpha-combined list, so the split
    # prover (one jitted program per gate type, prover.py) can compute this
    # "rest" prefix separately and add alpha^offset-scaled gate
    # contributions afterwards — field algebra is exact, so the
    # re-association is bit-identical
    constraint_terms = (evaluate_gate_constraints(A, common, vars)
                        if include_gate_constraints else [])

    if has_lookup:
        ns = common.selectors_info.num_selectors
        lookup_selectors = vars.local_constants[
            ns:ns + common.num_lookup_selectors]

    # l_0 may arrive as a thunk so its circuit-mode ops are emitted HERE —
    # after the gate constraints, before the s_ids — exactly like the
    # reference (vanishing_poly.rs:902: eval_l_0_circuit inside the body)
    if callable(l_0_x):
        l_0_x = l_0_x()

    # s_id_j = k_j * x, hoisted before the challenge loop (reference
    # vanishing_poly.rs:905-910: constant(k_j) then scalar_mul_ext)
    s_ids = [A.k_const_mul(common.k_is[j], x) for j in range(num_routed)]

    vanishing_z_1_terms = []
    vanishing_partial_products_terms = []
    vanishing_all_lookup_terms = []

    for i in range(num_challenges):
        z_x = local_zs[i]
        z_gx = next_zs[i]
        # L_0(x) (Z(x) - 1) as l_0*z - l_0 (reference :919 mul_sub)
        vanishing_z_1_terms.append(A.mul_sub(l_0_x, z_x, l_0_x))

        if has_lookup:
            npoly = common.num_lookup_polys
            vanishing_all_lookup_terms.extend(check_lookup_constraints(
                A, common, vars,
                local_lookup_zs[npoly * i:npoly * (i + 1)],
                next_lookup_zs[npoly * i:npoly * (i + 1)],
                lookup_selectors, deltas[4 * i:4 * (i + 1)],
                lut_re_evals[i]))

        gamma_l = A.lift_scalar(gammas[i])
        numerator_values = []
        denominator_values = []
        for j in range(num_routed):
            # shared wire+gamma, then beta*s_id + (wire+gamma) as one
            # mul_add (reference :943-952)
            wvpg = A.add(vars.local_wires[j], gamma_l)
            numerator_values.append(
                A.scalar_mul_add(betas[i], s_ids[j], wvpg))
            denominator_values.append(
                A.scalar_mul_add(betas[i], s_sigmas[j], wvpg))

        cur_partials = partial_products[i * num_prods:(i + 1) * num_prods]
        vanishing_partial_products_terms.extend(
            check_partial_products(A, numerator_values, denominator_values,
                                   cur_partials, z_x, z_gx, max_degree))

    vanishing_terms = (vanishing_z_1_terms
                       + vanishing_partial_products_terms
                       + vanishing_all_lookup_terms
                       + constraint_terms)

    return [A.reduce_with_powers(vanishing_terms, alphas[i])
            for i in range(num_challenges)]


def eval_l_0_host(A, n: int, x, x_pow_n):
    """L_0(x) = (x^n - 1) / (n (x - 1)) on the host extension algebra
    (reference plonk_common.rs:59-70)."""
    import math

    from ..field import host
    spec = A.spec
    one = A.one()
    if x == one:
        return one
    z = A.sub(x_pow_n, one)
    denom = A.mul_base_const(A.sub(x, one), n % spec.p)
    return host.ext_mul(spec, z, host.ext_inv(spec, denom))


def count_rest_terms(common) -> int:
    """Number of alpha-combined vanishing terms BEFORE the gate-constraint
    block (z1 + partial-product + lookup terms) — the alpha offset used by
    the split prover (prover.py) to scale per-gate contributions."""
    nch = common.config.num_challenges
    n = nch * (1 + (common.num_partial_products + 1))
    if common.num_lookup_polys:
        from ..gates.selectors import LOOKUP_SEL_START_END
        per = (4 + (common.num_lookup_selectors - LOOKUP_SEL_START_END)
               + 2 * (common.num_lookup_polys - 1))
        n += nch * per
    return n
