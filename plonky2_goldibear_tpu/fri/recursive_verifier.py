"""In-circuit FRI verifier (reference plonky2/src/fri/recursive_verifier.rs).

Same structure as the native verifier over Targets: per query round, verify
initial Merkle openings (cap-indexed), combine with alpha, then per fold
step select the claimed eval with RandomAccess, infer the next evaluation
with a CosetInterpolation gate at beta, and finish on the final polynomial.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

from ..field import host
from ..gates.coset_interpolation import CosetInterpolationGate
from ..plonk import gadgets as gd


@dataclass
class FriQueryStepTarget:
    evals: List[Tuple]          # ext targets
    merkle_proof: List[List]    # digests (lists of targets)


@dataclass
class FriInitialTreeProofTarget:
    evals_proofs: List[Tuple[List, List]]   # (leaf targets, sibling digests)

    def unsalted_eval(self, oracle_index, poly_index, salted,
                      salt_size: int = 4):
        evals = self.evals_proofs[oracle_index][0]
        if salted:
            evals = evals[: len(evals) - salt_size]
        return evals[poly_index]


@dataclass
class FriQueryRoundTarget:
    initial_trees_proof: FriInitialTreeProofTarget
    steps: List[FriQueryStepTarget]


@dataclass
class FriProofTarget:
    commit_phase_merkle_caps: List[List[List]]
    query_round_proofs: List[FriQueryRoundTarget]
    final_poly: List[Tuple]
    pow_witness: object


def add_virtual_fri_proof(b, num_leaves_per_oracle: List[int],
                          params) -> FriProofTarget:
    """reference fri/recursive_verifier.rs:397-425."""
    cap_height = params.config.cap_height
    caps = [[[b.add_virtual_target() for _ in range(
        b.spec.num_hash_out_elts)] for _ in range(1 << cap_height)]
        for _ in params.reduction_arity_bits]
    rounds = []
    for _ in range(params.config.num_query_rounds):
        evals_proofs = []
        merkle_len = params.lde_bits - cap_height
        for n_leaves in num_leaves_per_oracle:
            leaf = [b.add_virtual_target() for _ in range(n_leaves)]
            siblings = [[b.add_virtual_target()
                         for _ in range(b.spec.num_hash_out_elts)]
                        for _ in range(merkle_len)]
            evals_proofs.append((leaf, siblings))
        steps = []
        codeword_bits = params.lde_bits
        for arity_bits in params.reduction_arity_bits:
            codeword_bits -= arity_bits
            evals = [b.add_virtual_extension_target()
                     for _ in range(1 << arity_bits)]
            siblings = [[b.add_virtual_target()
                         for _ in range(b.spec.num_hash_out_elts)]
                        for _ in range(codeword_bits - cap_height)]
            steps.append(FriQueryStepTarget(evals=evals,
                                            merkle_proof=siblings))
        rounds.append(FriQueryRoundTarget(
            initial_trees_proof=FriInitialTreeProofTarget(evals_proofs),
            steps=steps))
    final_poly = [b.add_virtual_extension_target()
                  for _ in range(1 << (params.degree_bits
                                       - params.total_arities()))]
    return FriProofTarget(commit_phase_merkle_caps=caps,
                          query_round_proofs=rounds,
                          final_poly=final_poly,
                          pow_witness=b.add_virtual_target())


def _compute_evaluation(b, x, x_index_within_coset_bits, arity_bits,
                        evals, beta):
    """reference fri/recursive_verifier.rs:30-58."""
    spec = b.spec
    arity = 1 << arity_bits
    assert len(evals) == arity
    g = spec.two_adic_generator(arity_bits)
    g_inv = pow(g, arity - 1, spec.p)

    perm = host.reverse_index_bits_perm(arity_bits)
    evals_nat = [evals[perm[i]] for i in range(arity)]
    # g^(arity - rev_x) == (g^-1)^rev_x: reversed LSB-first bits into the
    # LSB-first exp gadget (reference fri/recursive_verifier.rs:49)
    start = gd.exp_from_bits_const_base(
        b, g_inv, list(reversed(x_index_within_coset_bits)))
    coset_start = b.mul(start, x)

    gate = CosetInterpolationGate(arity_bits,
                                  b.config.max_quotient_degree_factor, spec)
    return gd.interpolate_coset(b, gate, coset_start, evals_nat, beta)


def fri_combine_initial_circuit(b, instance, initial_proof, alpha,
                                subgroup_x, reduced_openings, params):
    """reference fri/recursive_verifier.rs:211-250."""
    subgroup_x_ext = b.convert_to_ext(subgroup_x)
    red = gd.ReducingFactorTarget(alpha)
    total = b.zero_extension()
    for batch, red_open in zip(instance.batches, reduced_openings):
        evals = []
        for pinfo in batch.polynomials:
            blinding = instance.oracles[pinfo.oracle_index].blinding
            salted = params.hiding and blinding
            evals.append(initial_proof.unsalted_eval(
                pinfo.oracle_index, pinfo.polynomial_index, salted))
        reduced_evals = red.reduce_base(evals, b)
        numerator = b.sub_extension(reduced_evals, red_open)
        denominator = b.sub_extension(subgroup_x_ext, batch.point)
        total = red.shift(total, b)
        # fused x/y + z (reference fri/recursive_verifier.rs:248)
        total = b.div_add_extension(numerator, denominator, total)
    return total


def verify_fri_proof_circuit(b, instance, openings_batches, challenges,
                             initial_merkle_caps, proof: FriProofTarget,
                             params):
    """reference fri/recursive_verifier.rs:104-175."""
    assert params.final_poly_len == len(proof.final_poly)
    n = params.lde_size

    gd.assert_leading_zeros(
        b, challenges["fri_pow_response"],
        params.config.proof_of_work_bits + (64 - b.spec.bits))

    assert params.config.num_query_rounds == len(proof.query_round_proofs)

    # precomputed reduced openings
    reduced_openings = []
    for batch_vals in openings_batches:
        red = gd.ReducingFactorTarget(challenges["fri_alpha"])
        reduced_openings.append(red.reduce(batch_vals, b))

    for x_index, round_proof in zip(challenges["fri_query_indices"],
                                    proof.query_round_proofs):
        _verifier_query_round(b, instance, challenges, reduced_openings,
                              initial_merkle_caps, proof, x_index, n,
                              round_proof, params)


def _verifier_query_round(b, instance, challenges, reduced_openings,
                          initial_merkle_caps, proof, x_index, n,
                          round_proof, params):
    spec = b.spec
    n_log = host.log2_strict(n)

    # non-canonical decomposition is fine for default configs (reference
    # fri/recursive_verifier.rs:375-392 soundness comparison)
    x_index_bits = gd.low_bits(b, x_index, n_log, True, spec.bits)
    cap_index = gd.le_sum(
        b, x_index_bits[len(x_index_bits) - params.config.cap_height:])

    for (evals, mproof), cap in zip(
            round_proof.initial_trees_proof.evals_proofs,
            initial_merkle_caps):
        gd.verify_merkle_proof_to_cap_with_cap_index(
            b, list(evals), x_index_bits, cap_index, cap, mproof)

    # subgroup_x = g_F * phi^rev(x_index): reversed LSB-first bits into the
    # LSB-first exp gadget (reference fri/recursive_verifier.rs:296-300)
    phi = spec.two_adic_generator(n_log)
    phi_pow = gd.exp_from_bits_const_base(b, phi,
                                          list(reversed(x_index_bits)))
    g_const = b.constant(spec.coset_shift)
    subgroup_x = b.mul(g_const, phi_pow)

    old_eval = fri_combine_initial_circuit(
        b, instance, round_proof.initial_trees_proof,
        challenges["fri_alpha"], subgroup_x, reduced_openings, params)

    for i, arity_bits in enumerate(params.reduction_arity_bits):
        evals = round_proof.steps[i].evals
        coset_index_bits = x_index_bits[arity_bits:]
        x_index_within_coset_bits = x_index_bits[:arity_bits]
        x_index_within_coset = gd.le_sum(b, x_index_within_coset_bits)

        new_eval = gd.random_access_extension(b, x_index_within_coset,
                                              list(evals))
        b.connect_extension(new_eval, old_eval)

        old_eval = _compute_evaluation(
            b, subgroup_x, x_index_within_coset_bits, arity_bits, evals,
            challenges["fri_betas"][i])

        flat = [c for e in evals for c in e]
        gd.verify_merkle_proof_to_cap_with_cap_index(
            b, flat, coset_index_bits, cap_index,
            proof.commit_phase_merkle_caps[i],
            round_proof.steps[i].merkle_proof)

        subgroup_x = gd.exp_power_of_2(b, subgroup_x, arity_bits)
        x_index_bits = coset_index_bits

    # final polynomial evaluation at subgroup_x via ReducingExtensionGates
    # (reference fri/recursive_verifier.rs:363-372 -> polynomial.rs:24-33)
    subgroup_x_ext = b.convert_to_ext(subgroup_x)
    red = gd.ReducingFactorTarget(subgroup_x_ext)
    eval_t = red.reduce(list(proof.final_poly), b)
    b.connect_extension(eval_t, old_eval)
