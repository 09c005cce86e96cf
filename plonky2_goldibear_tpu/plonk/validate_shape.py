"""Proof shape validation before verification
(reference plonky2/src/plonk/validate_shape.rs:1-72 and
fri/validate_shape.rs).

Malformed proofs (wrong list lengths, truncated FRI rounds, wrong extension
degree) must fail with a clean VerificationError instead of an internal
IndexError mid-verification.
"""

from __future__ import annotations


class ShapeError(Exception):
    pass


def _check(cond: bool, what: str):
    if not cond:
        raise ShapeError(f"malformed proof: {what}")


def _check_cap(cap, cap_height: int, hash_len: int, what: str):
    _check(len(cap) == 1 << cap_height, f"{what}: cap length")
    for d in cap:
        if isinstance(d, (bytes, bytearray)):
            continue
        _check(len(d) == hash_len, f"{what}: digest width")


def _check_exts(vals, n: int, degree: int, what: str):
    _check(len(vals) == n, f"{what}: count {len(vals)} != {n}")
    for v in vals:
        _check(len(v) == degree, f"{what}: extension degree")


def validate_proof_with_pis_shape(proof_with_pis, common) -> None:
    """reference validate_shape.rs:10-72."""
    config = common.config
    spec = common.spec
    d = spec.ext_degree
    h = spec.num_hash_out_elts
    cap_height = config.fri_config.cap_height
    proof = proof_with_pis.proof

    _check(len(proof_with_pis.public_inputs) == common.num_public_inputs,
           "public input count")
    _check_cap(proof.wires_cap, cap_height, h, "wires cap")
    _check_cap(proof.plonk_zs_partial_products_cap, cap_height, h,
               "zs/partial products cap")
    _check_cap(proof.quotient_polys_cap, cap_height, h, "quotient cap")

    o = proof.openings
    _check_exts(o.constants, common.num_constants, d, "constants openings")
    _check_exts(o.plonk_sigmas, config.num_routed_wires, d,
                "sigma openings")
    _check_exts(o.wires, config.num_wires, d, "wire openings")
    _check_exts(o.plonk_zs, config.num_challenges, d, "Z openings")
    _check_exts(o.plonk_zs_next, config.num_challenges, d, "Z next openings")
    _check_exts(o.partial_products,
                config.num_challenges * common.num_partial_products, d,
                "partial product openings")
    _check_exts(o.quotient_polys, common.num_quotient_polys(), d,
                "quotient openings")
    _check_exts(o.lookup_zs, common.num_all_lookup_polys(), d,
                "lookup Z openings")
    _check_exts(o.lookup_zs_next, common.num_all_lookup_polys(), d,
                "lookup Z next openings")

    validate_fri_proof_shape(proof.opening_proof, common)


def validate_fri_proof_shape(fri_proof, common) -> None:
    """reference fri/validate_shape.rs."""
    spec = common.spec
    d = spec.ext_degree
    h = spec.num_hash_out_elts
    params = common.fri_params
    config = params.config
    cap_height = config.cap_height

    _check(len(fri_proof.commit_phase_merkle_caps)
           == len(params.reduction_arity_bits), "FRI commit caps count")
    for cap in fri_proof.commit_phase_merkle_caps:
        _check_cap(cap, cap_height, h, "FRI commit cap")

    _check(len(fri_proof.query_round_proofs) == config.num_query_rounds,
           "FRI query round count")
    lde_bits = params.degree_bits + config.rate_bits
    for qr in fri_proof.query_round_proofs:
        init = qr.initial_trees_proof.evals_proofs
        _check(len(init) == 4, "initial tree proof count")
        codeword_bits = lde_bits
        # leaf width per oracle (reference fri/validate_shape.rs: salt_size
        # = 4 on blinded oracles, fri/oracle.rs:25)
        salt = 4 if common.config.zero_knowledge else 0
        leaf_lens = [
            common.num_constants + common.config.num_routed_wires,
            common.config.num_wires + salt,
            common.num_zs_partial_products_polys()
            + common.num_all_lookup_polys() + salt,
            common.num_quotient_polys() + salt,
        ]
        for ep, leaf_len in zip(init, leaf_lens):
            _check(len(ep) == 2, "initial tree proof pair")
            _check(len(ep[0]) == leaf_len, "initial tree evals length")
            _check(len(ep[1]) == lde_bits - cap_height,
                   "initial tree merkle path length")
        _check(len(qr.steps) == len(params.reduction_arity_bits),
               "FRI step count")
        for step, arity_bits in zip(qr.steps, params.reduction_arity_bits):
            _check_exts(step.evals, 1 << arity_bits, d, "FRI step evals")
            codeword_bits -= arity_bits
            _check(len(step.merkle_proof) == codeword_bits - cap_height,
                   "FRI step merkle path length")

    final_len = params.degree_bits
    for bits in params.reduction_arity_bits:
        final_len -= bits
    _check_exts(fri_proof.final_poly, 1 << final_len, d, "FRI final poly")
