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

from ..gates.base import (DeviceBaseAlgebra, EvaluationVars, compute_filter,
                          eval_filtered)


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
            cs = [A.mul(filt, c) for c in dev(A.F, stacked, vars)]
        else:
            cs = eval_filtered(A, gate, vars, i, sel_idx, group,
                               num_selectors, common.num_lookup_selectors)
        for j, c in enumerate(cs):
            constraints[j] = A.add(constraints[j], c)
    return constraints


def check_partial_products(A, numerators: Sequence, denominators: Sequence,
                           partials: Sequence, z_x, z_gx,
                           max_degree: int) -> List:
    """reference util/partial_products.rs:53-80."""
    accs = [z_x] + list(partials) + [z_gx]
    out = []
    idx = 0
    chunk_i = 0
    n = len(numerators)
    while idx < n:
        hi = min(idx + max_degree, n)
        num_prod = None
        den_prod = None
        for j in range(idx, hi):
            num_prod = numerators[j] if num_prod is None else \
                A.mul(num_prod, numerators[j])
            den_prod = denominators[j] if den_prod is None else \
                A.mul(den_prod, denominators[j])
        prev_acc, next_acc = accs[chunk_i], accs[chunk_i + 1]
        out.append(A.sub(A.mul(prev_acc, num_prod),
                         A.mul(next_acc, den_prod)))
        idx = hi
        chunk_i += 1
    assert chunk_i == len(partials) + 1
    return out


def reduce_with_powers(A, terms: Sequence, alpha):
    """sum_i alpha^i terms[i] via Horner (reference plonk_common.rs:122-135);
    alpha is a base-field scalar (host int / traced device scalar)."""
    cumul = A.zero()
    for term in reversed(list(terms)):
        cumul = A.add(A.mul_scalar(cumul, alpha), term)
    return cumul


def eval_vanishing_poly(A, common, x, l_0_x, vars: EvaluationVars,
                        local_zs: Sequence, next_zs: Sequence,
                        partial_products: Sequence, s_sigmas: Sequence,
                        betas: Sequence[int], gammas: Sequence[int],
                        alphas: Sequence[int]) -> List:
    """Returns one combined value per alpha challenge
    (reference vanishing_poly.rs:57-180; lookups land in a later round).

    x and every entry of vars/zs/sigmas are algebra values; betas, gammas and
    alphas are base-field *scalars* — host ints for the verifier, traced
    scalar device arrays for the prover (so challenge values stay out of the
    compiled graph).
    """
    max_degree = common.quotient_degree_factor
    num_prods = common.num_partial_products
    num_challenges = common.config.num_challenges
    num_routed = common.config.num_routed_wires

    constraint_terms = evaluate_gate_constraints(A, common, vars)

    vanishing_z_1_terms = []
    vanishing_partial_products_terms = []

    for i in range(num_challenges):
        z_x = local_zs[i]
        z_gx = next_zs[i]
        vanishing_z_1_terms.append(
            A.mul(l_0_x, A.add_base_const(z_x, common.spec.p - 1)))

        gamma_l = A.lift_scalar(gammas[i])
        numerator_values = []
        denominator_values = []
        for j in range(num_routed):
            wire = vars.local_wires[j]
            k_i = common.k_is[j]
            s_id_beta = A.mul_scalar(A.mul_base_const(x, k_i), betas[i])
            numerator_values.append(
                A.add(A.add(wire, s_id_beta), gamma_l))
            s_sigma_beta = A.mul_scalar(s_sigmas[j], betas[i])
            denominator_values.append(
                A.add(A.add(wire, s_sigma_beta), gamma_l))

        cur_partials = partial_products[i * num_prods:(i + 1) * num_prods]
        vanishing_partial_products_terms.extend(
            check_partial_products(A, numerator_values, denominator_values,
                                   cur_partials, z_x, z_gx, max_degree))

    vanishing_terms = (vanishing_z_1_terms
                       + vanishing_partial_products_terms
                       + constraint_terms)

    return [reduce_with_powers(A, vanishing_terms, alphas[i])
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
