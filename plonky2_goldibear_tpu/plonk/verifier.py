"""Native proof verifier, host-side exact arithmetic
(reference plonky2/src/plonk/verifier.rs).
"""

from __future__ import annotations

from ..field import host
from ..fri import verifier as fri_verifier
from ..gates.base import EvaluationVars, HostExtAlgebra
from ..hash import poseidon_gl
from . import vanishing
from .get_challenges import get_challenges
from .proof import ProofWithPublicInputs


class VerificationError(Exception):
    pass


def verify(proof_with_pis: ProofWithPublicInputs, verifier_data, common,
           hasher=poseidon_gl, inner_hasher=None) -> None:
    """Raises on invalid proofs (reference verifier.rs:17-129)."""
    from .validate_shape import ShapeError, validate_proof_with_pis_shape

    spec = common.spec
    proof = proof_with_pis.proof

    try:
        validate_proof_with_pis_shape(proof_with_pis, common)
    except ShapeError as e:
        raise VerificationError(str(e)) from None
    if len(proof_with_pis.public_inputs) != common.num_public_inputs:
        raise VerificationError("wrong number of public inputs")

    # PI hash is the algebraic InnerHasher (reference verifier.rs:54)
    public_inputs_hash = (inner_hasher or hasher).hash_no_pad_host(
        proof_with_pis.public_inputs)
    challenges = get_challenges(proof_with_pis, public_inputs_hash,
                                verifier_data.circuit_digest, common, hasher)

    A = HostExtAlgebra(spec)
    openings = proof.openings
    pi_hash_ext = [A.from_int(x) for x in public_inputs_hash]
    vars = EvaluationVars(
        [tuple(c) for c in openings.constants],
        [tuple(w) for w in openings.wires],
        pi_hash_ext)

    zeta = challenges["plonk_zeta"]
    zeta_pow_deg = host.ext_pow(spec, zeta, common.degree)
    l_0_zeta = vanishing.eval_l_0_host(A, common.degree, zeta, zeta_pow_deg)

    deltas = challenges.get("plonk_deltas", [])
    lut_re_evals = (vanishing.get_lut_re_evals(common, deltas)
                    if common.num_lookup_polys else [])
    vanishing_polys_zeta = vanishing.eval_vanishing_poly(
        A, common, zeta, l_0_zeta, vars,
        [tuple(z) for z in openings.plonk_zs],
        [tuple(z) for z in openings.plonk_zs_next],
        [tuple(x) for x in openings.partial_products],
        [tuple(s) for s in openings.plonk_sigmas],
        challenges["plonk_betas"], challenges["plonk_gammas"],
        challenges["plonk_alphas"], deltas=deltas,
        local_lookup_zs=[tuple(z) for z in openings.lookup_zs],
        next_lookup_zs=[tuple(z) for z in openings.lookup_zs_next],
        lut_re_evals=lut_re_evals)

    # quotient reconstruction: t(zeta) = reduce(chunk, zeta^n)
    # (reference verifier.rs:93-113)
    z_h_zeta = host.ext_sub(spec, zeta_pow_deg, host.ext_one(spec))
    qdf = common.quotient_degree_factor
    for i in range(common.config.num_challenges):
        chunk = openings.quotient_polys[i * qdf:(i + 1) * qdf]
        acc = host.ext_zero(spec)
        for term in reversed(chunk):
            acc = host.ext_add(spec, host.ext_mul(spec, acc, zeta_pow_deg),
                               tuple(term))
        lhs = vanishing_polys_zeta[i]
        rhs = host.ext_mul(spec, z_h_zeta, acc)
        if tuple(lhs) != tuple(rhs):
            raise VerificationError(
                f"vanishing != Z_H * quotient for challenge {i}")

    merkle_caps = [
        verifier_data.constants_sigmas_cap,
        proof.wires_cap,
        proof.plonk_zs_partial_products_cap,
        proof.quotient_polys_cap,
    ]

    instance = common.get_fri_instance(zeta)
    fri_verifier.verify_fri_proof(
        spec, instance, openings.to_fri_openings(), challenges, merkle_caps,
        proof.opening_proof, common.fri_params, hasher)
