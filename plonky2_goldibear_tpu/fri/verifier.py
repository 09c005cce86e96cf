"""FRI verifier, host-side exact arithmetic
(reference plonky2/src/fri/verifier.rs).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from ..field import host
from ..hash import merkle, poseidon_gl
from ..plonk.proof import FriProof
from .prover import _leading_zeros64, reduce_openings

Ext = Tuple[int, ...]


class FriVerificationError(Exception):
    pass


def _ensure(cond, msg):
    if not cond:
        raise FriVerificationError(msg)


def compute_evaluation(spec: host.FieldSpec, x: int,
                       x_index_within_coset: int, arity_bits: int,
                       evals: Sequence[Ext], beta: Ext) -> Ext:
    """P'(x^arity) from {P(x g^i)} by interpolation at beta
    (reference fri/verifier.rs:23-48)."""
    arity = 1 << arity_bits
    assert len(evals) == arity
    g = spec.two_adic_generator(arity_bits)
    # reorder evals into natural coset order
    perm = host.reverse_index_bits_perm(arity_bits)
    evals_nat = [evals[perm[i]] for i in range(arity)]
    rev_x = host.reverse_bits(x_index_within_coset, arity_bits)
    coset_start = x * pow(g, arity - rev_x, spec.p) % spec.p
    points = []
    acc = coset_start
    for i in range(arity):
        points.append(acc)
        acc = acc * g % spec.p
    return interpolate_ext(spec, points, evals_nat, beta)


def interpolate_ext(spec: host.FieldSpec, xs: Sequence[int],
                    ys: Sequence[Ext], z: Ext) -> Ext:
    """Lagrange interpolation of base-field points with ext values, evaluated
    at an ext point (reference field/src/interpolation.rs barycentric;
    O(n^2) host arithmetic is fine at arity <= 16)."""
    p = spec.p
    n = len(xs)
    result = host.ext_zero(spec)
    for i in range(n):
        num = host.ext_one(spec)
        den = 1
        for j in range(n):
            if i == j:
                continue
            num = host.ext_mul(spec, num,
                               host.ext_sub(spec, z,
                                            host.ext_from_base(spec, xs[j])))
            den = den * (xs[i] - xs[j]) % p
        li = host.ext_scalar_mul(spec, num, host.finv(den % p, p))
        result = host.ext_add(spec, result, host.ext_mul(spec, li, ys[i]))
    return result


def fri_verify_proof_of_work(spec, fri_pow_response: int, config):
    min_lz = config.proof_of_work_bits + (64 - spec.bits)
    _ensure(_leading_zeros64(fri_pow_response) >= min_lz,
            "Invalid proof of work witness.")


def verify_fri_proof(spec, instance, openings: List[List[Ext]],
                     challenges, initial_merkle_caps, proof: FriProof,
                     params, hasher=poseidon_gl):
    """reference fri/verifier.rs:66-117.

    openings: batches of claimed opening values (FriOpenings).
    challenges: dict with fri_alpha, fri_betas, fri_pow_response,
    fri_query_indices.
    """
    n = params.lde_size
    fri_verify_proof_of_work(spec, challenges["fri_pow_response"],
                             params.config)
    _ensure(params.config.num_query_rounds == len(proof.query_round_proofs),
            "Number of query rounds does not match config.")

    alpha = challenges["fri_alpha"]
    precomputed = [reduce_openings(spec, batch_vals, alpha)
                   for batch_vals in openings]

    for x_index, round_proof in zip(challenges["fri_query_indices"],
                                    proof.query_round_proofs):
        _verifier_query_round(spec, instance, challenges, precomputed,
                              initial_merkle_caps, proof, x_index, n,
                              round_proof, params, hasher)


def fri_combine_initial(spec, instance, initial_proof, alpha: Ext,
                        subgroup_x: int, precomputed: List[Ext],
                        params) -> Ext:
    """reference fri/verifier.rs:131-171."""
    x_ext = host.ext_from_base(spec, subgroup_x)
    total = 0
    s = host.ext_zero(spec)
    for batch, red_open in zip(instance.batches, precomputed):
        evals = []
        for pinfo in batch.polynomials:
            blinding = instance.oracles[pinfo.oracle_index].blinding
            salted = params.hiding and blinding
            evals.append(initial_proof.unsalted_eval(
                pinfo.oracle_index, pinfo.polynomial_index, salted))
        reduced_evals = host.ext_zero(spec)
        for e in reversed(evals):
            reduced_evals = host.ext_add(
                spec, host.ext_mul(spec, reduced_evals, alpha),
                host.ext_from_base(spec, e))
        numerator = host.ext_sub(spec, reduced_evals, red_open)
        denominator = host.ext_sub(spec, x_ext, tuple(batch.point))
        quotient = host.ext_div(spec, numerator, denominator)
        shift = host.ext_pow(spec, alpha, len(evals))
        s = host.ext_add(spec, host.ext_mul(spec, s, shift), quotient)
        total += len(evals)
    return s


def _verifier_query_round(spec, instance, challenges, precomputed,
                          initial_merkle_caps, proof: FriProof,
                          x_index: int, n: int, round_proof, params, hasher):
    # initial Merkle proofs
    for (evals, mproof), cap in zip(
            round_proof.initial_trees_proof.evals_proofs,
            initial_merkle_caps):
        _ensure(merkle.verify_merkle_proof_to_cap(evals, x_index, cap,
                                                  mproof, hasher),
                "initial Merkle proof failed")

    log_n = host.log2_strict(n)
    p = spec.p
    subgroup_x = (spec.coset_shift
                  * pow(spec.two_adic_generator(log_n),
                        host.reverse_bits(x_index, log_n), p)) % p

    old_eval = fri_combine_initial(spec, instance,
                                   round_proof.initial_trees_proof,
                                   challenges["fri_alpha"], subgroup_x,
                                   precomputed, params)

    for i, arity_bits in enumerate(params.reduction_arity_bits):
        arity = 1 << arity_bits
        evals = round_proof.steps[i].evals
        coset_index = x_index >> arity_bits
        x_index_within_coset = x_index & (arity - 1)
        _ensure(tuple(evals[x_index_within_coset]) == tuple(old_eval),
                "inconsistent fold evaluation")
        old_eval = compute_evaluation(spec, subgroup_x,
                                      x_index_within_coset, arity_bits,
                                      evals, challenges["fri_betas"][i])
        flat = [c for e in evals for c in e]
        _ensure(merkle.verify_merkle_proof_to_cap(
            flat, coset_index, proof.commit_phase_merkle_caps[i],
            round_proof.steps[i].merkle_proof, hasher),
            "commit-phase Merkle proof failed")
        subgroup_x = pow(subgroup_x, arity, p)
        x_index = coset_index

    # final poly evaluation (coefficients low-to-high, Horner)
    acc = host.ext_zero(spec)
    x_ext = host.ext_from_base(spec, subgroup_x)
    for c in reversed(proof.final_poly):
        acc = host.ext_add(spec, host.ext_mul(spec, acc, x_ext), tuple(c))
    _ensure(tuple(acc) == tuple(old_eval),
            "Final polynomial evaluation is invalid.")
