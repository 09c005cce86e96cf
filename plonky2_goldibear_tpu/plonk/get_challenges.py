"""Fiat-Shamir challenge replay from a proof
(reference plonky2/src/plonk/get_challenges.rs:26-97,
fri/challenges.rs:15-70).
"""

from __future__ import annotations

from typing import Dict, List

from ..hash.challenger import Challenger
from .proof import ProofWithPublicInputs


def get_challenges(proof_with_pis: ProofWithPublicInputs,
                   public_inputs_hash: List[int], circuit_digest: List[int],
                   common, hasher) -> Dict:
    config = common.config
    num_challenges = config.num_challenges
    proof = proof_with_pis.proof

    ch = Challenger(spec=common.spec, permute=hasher.permute_host,
                    width=hasher.WIDTH, rate=hasher.RATE)
    ch.observe_hash(circuit_digest)
    ch.observe_hash(public_inputs_hash)

    ch.observe_cap(proof.wires_cap)
    plonk_betas = ch.get_n_challenges(num_challenges)
    plonk_gammas = ch.get_n_challenges(num_challenges)

    plonk_deltas = []
    if common.num_lookup_polys != 0:
        additional = ch.get_n_challenges(2 * num_challenges)
        plonk_deltas = list(plonk_betas) + list(plonk_gammas) + additional

    ch.observe_cap(proof.plonk_zs_partial_products_cap)
    plonk_alphas = ch.get_n_challenges(num_challenges)

    ch.observe_cap(proof.quotient_polys_cap)
    plonk_zeta = ch.get_extension_challenge()

    for batch_vals in proof.openings.to_fri_openings():
        ch.observe_extension_elements(batch_vals)

    # FRI challenges (reference fri/challenges.rs:25-70)
    lde_size = common.lde_size
    fri_alpha = ch.get_extension_challenge()
    fri_betas = []
    for cap in proof.opening_proof.commit_phase_merkle_caps:
        ch.observe_cap(cap)
        fri_betas.append(ch.get_extension_challenge())
    ch.observe_extension_elements(proof.opening_proof.final_poly)
    ch.observe_element(proof.opening_proof.pow_witness)
    fri_pow_response = ch.get_challenge()
    fri_query_indices = [ch.get_challenge() % lde_size
                         for _ in range(config.fri_config.num_query_rounds)]

    return {
        "plonk_betas": plonk_betas,
        "plonk_gammas": plonk_gammas,
        "plonk_deltas": plonk_deltas,
        "plonk_alphas": plonk_alphas,
        "plonk_zeta": plonk_zeta,
        "fri_alpha": fri_alpha,
        "fri_betas": fri_betas,
        "fri_pow_response": fri_pow_response,
        "fri_query_indices": fri_query_indices,
    }
