"""Proof compression (reference plonky2/src/hash/path_compression.rs,
fri/proof.rs:139-330, plonk/proof.rs:111-204, get_challenges.rs:199-269).

Three mechanisms: Merkle-path deduplication across the query rounds,
deduplication of repeated query/coset indices, and dropping the per-step
evaluation the verifier can infer — decompression re-simulates the FRI
verification to rebuild it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

from ..fri import verifier as fri_verifier
from ..fri.prover import reduce_openings
from ..hash import poseidon_gl
from . import get_challenges as gc
from .proof import (FriInitialTreeProof, FriProof, FriQueryRound,
                    FriQueryStep, Proof, ProofWithPublicInputs)


def compress_merkle_proofs(cap_height: int, indices: List[int],
                           proofs: List[List]) -> List[List]:
    """reference hash/path_compression.rs:12-52."""
    assert proofs
    height = cap_height + len(proofs[0])
    num_leaves = 1 << height
    known = [False] * (2 * num_leaves)
    for i in indices:
        for j in range(height - cap_height):
            known[(i + num_leaves) >> j] = True
    out = []
    for i, siblings in zip(indices, proofs):
        comp = []
        index = i + num_leaves
        for sib in siblings:
            sib_index = index ^ 1
            if not known[sib_index]:
                comp.append(sib)
                known[sib_index] = True
            index >>= 1
            known[index] = True
        out.append(comp)
    return out


def decompress_merkle_proofs(leaves_data: List[List[int]],
                             indices: List[int],
                             compressed: List[List], height: int,
                             cap_height: int,
                             hasher=poseidon_gl) -> List[List]:
    """reference hash/path_compression.rs:56-110: layer-synchronized
    reconstruction of the omitted siblings."""
    num_leaves = 1 << height
    seen: Dict[int, List[int]] = {}
    for i, leaf in zip(indices, leaves_data):
        seen[i + num_leaves] = hasher.hash_or_noop_host(list(leaf))
    sib_iters = [iter(p) for p in compressed]
    decompressed: List[List] = [[] for _ in compressed]
    for layer in range(height - cap_height):
        for pi, i in enumerate(indices):
            index = (i + num_leaves) >> layer
            sib_index = index ^ 1
            if sib_index in seen:
                sib = seen[sib_index]
            else:
                sib = next(sib_iters[pi])
                seen[sib_index] = sib
            decompressed[pi].append(list(sib))
            cur = seen[index]
            parent = hasher.two_to_one_host(cur, sib) if index % 2 == 0 \
                else hasher.two_to_one_host(sib, cur)
            seen[index >> 1] = parent
    return decompressed


@dataclass
class CompressedFriQueryRounds:
    indices: List[int]
    initial_trees_proofs: Dict[int, FriInitialTreeProof]
    steps: List[Dict[int, FriQueryStep]]


@dataclass
class CompressedFriProof:
    commit_phase_merkle_caps: List
    query_round_proofs: CompressedFriQueryRounds
    final_poly: List
    pow_witness: int


@dataclass
class CompressedProof:
    wires_cap: List
    plonk_zs_partial_products_cap: List
    quotient_polys_cap: List
    openings: object
    opening_proof: CompressedFriProof


@dataclass
class CompressedProofWithPublicInputs:
    proof: CompressedProof
    public_inputs: List[int]


def compress_fri_proof(fri_proof: FriProof, indices: List[int],
                       params) -> CompressedFriProof:
    """reference fri/proof.rs:139-238."""
    cap_height = params.config.cap_height
    arity_bits = params.reduction_arity_bits
    num_reductions = len(arity_bits)
    num_initial = len(
        fri_proof.query_round_proofs[0].initial_trees_proof.evals_proofs)

    it_indices = [[] for _ in range(num_initial)]
    it_leaves = [[] for _ in range(num_initial)]
    it_proofs = [[] for _ in range(num_initial)]
    st_indices = [[] for _ in range(num_reductions)]
    st_evals = [[] for _ in range(num_reductions)]
    st_proofs = [[] for _ in range(num_reductions)]

    for index, qrp in zip(indices, fri_proof.query_round_proofs):
        idx = index
        for i, (leaf, proof) in enumerate(
                qrp.initial_trees_proof.evals_proofs):
            it_indices[i].append(idx)
            it_leaves[i].append(leaf)
            it_proofs[i].append(proof)
        for i, step in enumerate(qrp.steps):
            within = idx & ((1 << arity_bits[i]) - 1)
            idx >>= arity_bits[i]
            st_indices[i].append(idx)
            evals = list(step.evals)
            evals.pop(within)          # the verifier infers this one
            st_evals[i].append(evals)
            st_proofs[i].append(step.merkle_proof)

    it_compressed = [compress_merkle_proofs(cap_height, it_indices[i],
                                            it_proofs[i])
                     for i in range(num_initial)]
    st_compressed = [compress_merkle_proofs(cap_height, st_indices[i],
                                            st_proofs[i])
                     for i in range(num_reductions)]

    initial_map: Dict[int, FriInitialTreeProof] = {}
    for qi, index in enumerate(indices):
        if index not in initial_map:
            initial_map[index] = FriInitialTreeProof(evals_proofs=[
                (it_leaves[i][qi], it_compressed[i][qi])
                for i in range(num_initial)])
    step_maps: List[Dict[int, FriQueryStep]] = [dict()
                                                for _ in range(num_reductions)]
    for qi in range(len(indices)):
        for i in range(num_reductions):
            cidx = st_indices[i][qi]
            if cidx not in step_maps[i]:
                step_maps[i][cidx] = FriQueryStep(
                    evals=st_evals[i][qi],
                    merkle_proof=st_compressed[i][qi])

    return CompressedFriProof(
        commit_phase_merkle_caps=fri_proof.commit_phase_merkle_caps,
        query_round_proofs=CompressedFriQueryRounds(
            indices=list(indices), initial_trees_proofs=initial_map,
            steps=step_maps),
        final_poly=fri_proof.final_poly,
        pow_witness=fri_proof.pow_witness)


def compress(proof_with_pis: ProofWithPublicInputs, verifier_data, common,
             hasher=poseidon_gl) -> CompressedProofWithPublicInputs:
    """reference plonk/proof.rs:69-110."""
    pi_hash = hasher.hash_no_pad_host(proof_with_pis.public_inputs)
    challenges = gc.get_challenges(proof_with_pis, pi_hash,
                                   verifier_data.circuit_digest, common,
                                   hasher)
    indices = challenges["fri_query_indices"]
    p = proof_with_pis.proof
    return CompressedProofWithPublicInputs(
        proof=CompressedProof(
            wires_cap=p.wires_cap,
            plonk_zs_partial_products_cap=p.plonk_zs_partial_products_cap,
            quotient_polys_cap=p.quotient_polys_cap,
            openings=p.openings,
            opening_proof=compress_fri_proof(p.opening_proof, indices,
                                             common.fri_params)),
        public_inputs=list(proof_with_pis.public_inputs))


def _get_challenges_compressed(cproof: CompressedProofWithPublicInputs,
                               verifier_data, common, hasher):
    """Challenge replay works on the compressed form too: caps, openings,
    final poly and pow witness are unchanged."""
    shim = ProofWithPublicInputs(
        proof=Proof(
            wires_cap=cproof.proof.wires_cap,
            plonk_zs_partial_products_cap=cproof.proof
            .plonk_zs_partial_products_cap,
            quotient_polys_cap=cproof.proof.quotient_polys_cap,
            openings=cproof.proof.openings,
            opening_proof=FriProof(
                commit_phase_merkle_caps=cproof.proof.opening_proof
                .commit_phase_merkle_caps,
                query_round_proofs=[],
                final_poly=cproof.proof.opening_proof.final_poly,
                pow_witness=cproof.proof.opening_proof.pow_witness)),
        public_inputs=cproof.public_inputs)
    pi_hash = hasher.hash_no_pad_host(cproof.public_inputs)
    return gc.get_challenges(shim, pi_hash, verifier_data.circuit_digest,
                             common, hasher)


def get_inferred_elements(cproof: CompressedProofWithPublicInputs,
                          challenges, common) -> List[Tuple[int, ...]]:
    """Re-simulate FRI verification to rebuild the dropped evaluations
    (reference get_challenges.rs:199-269)."""
    spec = common.spec
    params = common.fri_params
    instance = common.get_fri_instance(challenges["plonk_zeta"])
    alpha = challenges["fri_alpha"]
    openings = cproof.proof.openings.to_fri_openings()
    precomputed = [reduce_openings(spec, batch, alpha) for batch in openings]
    log_n = params.lde_bits
    inferred = []
    seen = [set() for _ in params.reduction_arity_bits]
    qr = cproof.proof.opening_proof.query_round_proofs
    p = spec.p
    for x_index in challenges["fri_query_indices"]:
        subgroup_x = (spec.coset_shift
                      * pow(spec.two_adic_generator(log_n),
                            __import__("plonky2_goldibear_tpu.field.host",
                                       fromlist=["host"]).reverse_bits(
                                x_index, log_n), p)) % p
        old_eval = fri_verifier.fri_combine_initial(
            spec, instance, qr.initial_trees_proofs[x_index], alpha,
            subgroup_x, precomputed, params)
        for i, ab in enumerate(params.reduction_arity_bits):
            coset_index = x_index >> ab
            if coset_index in seen[i]:
                break
            seen[i].add(coset_index)
            inferred.append(old_eval)
            within = x_index & ((1 << ab) - 1)
            evals = list(qr.steps[i][coset_index].evals)
            evals.insert(within, old_eval)
            old_eval = fri_verifier.compute_evaluation(
                spec, subgroup_x, within, ab, evals,
                challenges["fri_betas"][i])
            subgroup_x = pow(subgroup_x, 1 << ab, p)
            x_index = coset_index
    return inferred


def decompress(cproof: CompressedProofWithPublicInputs, verifier_data,
               common, hasher=poseidon_gl) -> ProofWithPublicInputs:
    """reference fri/proof.rs:241-330."""
    challenges = _get_challenges_compressed(cproof, verifier_data, common,
                                            hasher)
    inferred = iter(get_inferred_elements(cproof, challenges, common))
    params = common.fri_params
    cap_height = params.config.cap_height
    arity_bits = params.reduction_arity_bits
    num_reductions = len(arity_bits)
    indices = challenges["fri_query_indices"]
    qr = cproof.proof.opening_proof.query_round_proofs
    num_initial = len(next(iter(qr.initial_trees_proofs.values()))
                      .evals_proofs)

    it_indices = [[] for _ in range(num_initial)]
    it_leaves = [[] for _ in range(num_initial)]
    it_proofs = [[] for _ in range(num_initial)]
    st_indices = [[] for _ in range(num_reductions)]
    st_evals = [[] for _ in range(num_reductions)]
    st_proofs = [[] for _ in range(num_reductions)]
    height = params.lde_bits
    heights = []
    h = height
    for ab in arity_bits:
        h -= ab
        heights.append(h)

    evals_by_depth: List[Dict[int, List]] = [dict()
                                             for _ in range(num_reductions)]
    for index in indices:
        idx = index
        itp = qr.initial_trees_proofs[idx]
        for i, (leaf, proof) in enumerate(itp.evals_proofs):
            it_indices[i].append(idx)
            it_leaves[i].append(leaf)
            it_proofs[i].append(proof)
        for i in range(num_reductions):
            within = idx & ((1 << arity_bits[i]) - 1)
            idx >>= arity_bits[i]
            step = qr.steps[i][idx]
            st_indices[i].append(idx)
            if idx in evals_by_depth[i]:
                evals = evals_by_depth[i][idx]
            else:
                evals = list(step.evals)
                evals.insert(within, next(inferred))
                evals_by_depth[i][idx] = evals
            st_evals[i].append([c for e in evals for c in e])
            st_proofs[i].append(step.merkle_proof)

    it_dec = [decompress_merkle_proofs(it_leaves[i], it_indices[i],
                                       it_proofs[i], height, cap_height,
                                       hasher)
              for i in range(num_initial)]
    st_dec = [decompress_merkle_proofs(st_evals[i], st_indices[i],
                                       st_proofs[i], heights[i], cap_height,
                                       hasher)
              for i in range(num_reductions)]

    query_rounds = []
    for qi, index in enumerate(indices):
        evals_proofs = [(it_leaves[i][qi], it_dec[i][qi])
                        for i in range(num_initial)]
        steps = []
        for i in range(num_reductions):
            flat = st_evals[i][qi]
            D = common.spec.ext_degree
            evals = [tuple(flat[j * D + d] for d in range(D))
                     for j in range(len(flat) // D)]
            steps.append(FriQueryStep(evals=evals,
                                      merkle_proof=st_dec[i][qi]))
        query_rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(evals_proofs),
            steps=steps))

    return ProofWithPublicInputs(
        proof=Proof(
            wires_cap=cproof.proof.wires_cap,
            plonk_zs_partial_products_cap=cproof.proof
            .plonk_zs_partial_products_cap,
            quotient_polys_cap=cproof.proof.quotient_polys_cap,
            openings=cproof.proof.openings,
            opening_proof=FriProof(
                commit_phase_merkle_caps=cproof.proof.opening_proof
                .commit_phase_merkle_caps,
                query_round_proofs=query_rounds,
                final_poly=cproof.proof.opening_proof.final_poly,
                pow_witness=cproof.proof.opening_proof.pow_witness)),
        public_inputs=list(cproof.public_inputs))
