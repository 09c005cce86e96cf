"""In-circuit PLONK proof verification
(reference plonky2/src/recursion/recursive_verifier.rs,
plonk/get_challenges.rs target side, plonk/vanishing_poly.rs:850+).

``verify_proof`` builds, inside an outer circuit, the complete verification
of an inner proof: hash its public inputs, replay the Fiat-Shamir transcript
with a RecursiveChallenger, evaluate the vanishing polynomial at zeta (via
the shared algebra-generic gate evaluations running over the circuit
algebra), check the quotient identity, and run the in-circuit FRI verifier.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

from ..field import host
from ..fri import oracle as oracle_mod
from ..fri import recursive_verifier as fric
from ..gates.base import EvaluationVars
from ..gates.circuit_algebra import CircuitExtAlgebra
from ..iop.witness import PartialWitness
from ..plonk import gadgets as gd
from ..plonk import vanishing
from ..plonk.circuit_data import (FriBatchInfo, FriInstanceInfo,
                                  ORACLE_CONSTANTS_SIGMAS, ORACLE_QUOTIENT,
                                  ORACLE_WIRES, ORACLE_ZS_PARTIAL_PRODUCTS,
                                  FriPolynomialInfo)
from .challenger import RecursiveChallenger


@dataclass
class OpeningSetTarget:
    constants: List[Tuple]
    plonk_sigmas: List[Tuple]
    wires: List[Tuple]
    plonk_zs: List[Tuple]
    plonk_zs_next: List[Tuple]
    partial_products: List[Tuple]
    quotient_polys: List[Tuple]
    lookup_zs: List[Tuple] = None
    lookup_zs_next: List[Tuple] = None

    def to_fri_openings(self):
        """Batch layout mirrors proof.py OpeningSet.to_fri_openings
        (reference plonk/proof.rs:388-428): zeta batch has all polys incl.
        lookup Zs, g*zeta batch has plonk Zs + lookup Zs."""
        zeta_batch = (self.constants + self.plonk_sigmas + self.wires
                      + self.plonk_zs + self.partial_products
                      + self.quotient_polys + list(self.lookup_zs or []))
        return [zeta_batch,
                list(self.plonk_zs_next) + list(self.lookup_zs_next or [])]


@dataclass
class ProofTarget:
    wires_cap: List[List]
    plonk_zs_partial_products_cap: List[List]
    quotient_polys_cap: List[List]
    openings: OpeningSetTarget
    opening_proof: fric.FriProofTarget


@dataclass
class ProofWithPublicInputsTarget:
    proof: ProofTarget
    public_inputs: List


@dataclass
class VerifierCircuitTarget:
    constants_sigmas_cap: List[List]
    circuit_digest: List


def _virtual_cap(b, cap_height: int):
    return [[b.add_virtual_target() for _ in range(
        b.spec.num_hash_out_elts)] for _ in range(1 << cap_height)]


def add_virtual_verifier_data(b, cap_height: int) -> VerifierCircuitTarget:
    return VerifierCircuitTarget(
        constants_sigmas_cap=_virtual_cap(b, cap_height),
        circuit_digest=[b.add_virtual_target()
                        for _ in range(b.spec.num_hash_out_elts)])


def add_virtual_proof_with_pis(b, common) -> ProofWithPublicInputsTarget:
    """reference recursive_verifier.rs:142-206."""
    cap_height = common.config.fri_config.cap_height
    ext = b.add_virtual_extension_target

    openings = OpeningSetTarget(
        constants=[ext() for _ in range(common.num_constants)],
        plonk_sigmas=[ext() for _ in range(common.config.num_routed_wires)],
        wires=[ext() for _ in range(common.config.num_wires)],
        plonk_zs=[ext() for _ in range(common.config.num_challenges)],
        plonk_zs_next=[ext() for _ in range(common.config.num_challenges)],
        partial_products=[ext() for _ in range(
            common.config.num_challenges * common.num_partial_products)],
        quotient_polys=[ext() for _ in range(common.num_quotient_polys())],
        lookup_zs=[ext() for _ in range(common.num_all_lookup_polys())],
        lookup_zs_next=[ext() for _ in range(common.num_all_lookup_polys())])

    # salted (zk) oracles carry SALT_SIZE extra leaf columns (reference
    # recursive_verifier.rs:162-176, plonk_common.rs:salt_size)
    salt = oracle_mod.SALT_SIZE if common.fri_params.hiding else 0
    num_leaves_per_oracle = [
        common.num_preprocessed_polys(),
        common.config.num_wires + salt,
        common.num_zs_partial_products_polys()
        + common.num_all_lookup_polys() + salt,
    ]
    if common.num_quotient_polys() > 0:
        num_leaves_per_oracle.append(common.num_quotient_polys() + salt)
    proof = ProofTarget(
        wires_cap=_virtual_cap(b, cap_height),
        plonk_zs_partial_products_cap=_virtual_cap(b, cap_height),
        quotient_polys_cap=_virtual_cap(b, cap_height),
        openings=openings,
        opening_proof=fric.add_virtual_fri_proof(b, num_leaves_per_oracle,
                                                 common.fri_params))
    pis = [b.add_virtual_target()
           for _ in range(common.num_public_inputs)]
    return ProofWithPublicInputsTarget(proof=proof, public_inputs=pis)


def get_fri_instance_target(b, common, zeta) -> FriInstanceInfo:
    """common.get_fri_instance with extension-target opening points."""
    inst = common.get_fri_instance(host.ext_one(common.spec))  # shape only
    g = common.spec.two_adic_generator(common.degree_bits)
    zeta_next = b.mul_const_extension(g, zeta)
    inst.batches[0].point = zeta
    inst.batches[1].point = zeta_next
    return inst


def get_challenges_target(b, proof_t: ProofTarget, public_inputs_hash,
                          circuit_digest, common):
    """Transcript replay over targets (reference get_challenges.rs:26-97)."""
    config = common.config
    nch = config.num_challenges
    ch = RecursiveChallenger(b)
    ch.observe_hash(circuit_digest)
    ch.observe_hash(public_inputs_hash)

    ch.observe_cap(proof_t.wires_cap)
    plonk_betas = ch.get_n_challenges(nch)
    plonk_gammas = ch.get_n_challenges(nch)

    # lookup delta challenges (reference get_challenges.rs:49-76): the four
    # per-challenge coins are [beta, gamma, extra_0, extra_1]
    plonk_deltas = []
    if common.num_lookup_polys != 0:
        additional = ch.get_n_challenges(2 * nch)
        plonk_deltas = list(plonk_betas) + list(plonk_gammas) + additional

    ch.observe_cap(proof_t.plonk_zs_partial_products_cap)
    plonk_alphas = ch.get_n_challenges(nch)

    ch.observe_cap(proof_t.quotient_polys_cap)
    plonk_zeta = ch.get_extension_challenge()

    ch.observe_openings(proof_t.openings.to_fri_openings())

    fri_alpha = ch.get_extension_challenge()
    fri_betas = []
    for cap in proof_t.opening_proof.commit_phase_merkle_caps:
        ch.observe_cap(cap)
        fri_betas.append(ch.get_extension_challenge())
    ch.observe_extension_elements(proof_t.opening_proof.final_poly)
    ch.observe_element(proof_t.opening_proof.pow_witness)
    fri_pow_response = ch.get_challenge()
    fri_query_indices = ch.get_n_challenges(
        config.fri_config.num_query_rounds)

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


def get_lut_re_evals_circuit(b, common, deltas) -> List[List]:
    """In-circuit LUT-polynomial evaluation at the delta challenge targets
    (reference vanishing_poly.rs:31-52 get_lut_poly + its circuit use at
    :991; host twin is vanishing.get_lut_re_evals).  Per challenge i, per
    LUT: Horner over the LUT entries (inp + ChallengeB*out) at
    ChallengeDelta, then shift by Delta^(padding)."""
    from ..gates.lookup_gates import LookupTableGate

    nch = common.config.num_challenges
    num_lut_slots = LookupTableGate.num_slots_of(common.config)
    out = []
    for i in range(nch):
        delta_b = deltas[4 * i + 1]
        delta_d = deltas[4 * i + 3]
        evals = []
        for lut in common.luts:
            rows = -(-len(lut) // num_lut_slots)
            degree = num_lut_slots * rows
            acc = b.zero()
            for inp, out_v in lut:
                c_t = b.add_const(b.mul_const(int(out_v), delta_b), int(inp))
                acc = b.mul_add(acc, delta_d, c_t)
            pad = degree - len(lut)
            if pad:
                # acc *= delta_d^pad (square-and-multiply over targets)
                dpow, base, e = None, delta_d, pad
                while e:
                    if e & 1:
                        dpow = base if dpow is None else b.mul(dpow, base)
                    e >>= 1
                    if e:
                        base = b.square(base)
                acc = b.mul(acc, dpow)
            evals.append(acc)
        out.append(evals)
    return out


def eval_l_0_circuit(b, n: int, x, x_pow_n):
    """L_0(x) = (x^n - 1) / (n (x - 1)) emitted op-for-op like the
    reference (plonk_common.rs:75-101: one, converted neg_one, zero-poly
    sub, then denominator = arithmetic_extension(n, n, x, one, neg_one))."""
    one = b.one_extension()
    neg_one = b.convert_to_ext(b.neg_one())
    eval_zero_poly = b.sub_extension(x_pow_n, one)
    denominator = b.arithmetic_extension(n % b.spec.p, n % b.spec.p,
                                         x, one, neg_one)
    return b.div_extension(eval_zero_poly, denominator)


def verify_proof(b, proof_with_pis_t: ProofWithPublicInputsTarget,
                 verifier_data_t: VerifierCircuitTarget, common):
    """reference recursive_verifier.rs:23-140.

    NOTE on fri_query_indices: the native verifier reduces the challenge mod
    lde_size; in-circuit the index target is the RAW challenge, whose low
    lde_bits (from the 64-bit non-canonical decomposition) give the same
    index distribution (reference fri/challenges.rs:85-123 — target-side
    indices are raw challenges, bit-decomposed per query).
    """
    spec = common.spec
    proof_t = proof_with_pis_t.proof

    public_inputs_hash = b.hash_n_to_m_no_pad(
        proof_with_pis_t.public_inputs, spec.num_hash_out_elts)

    challenges = get_challenges_target(
        b, proof_t, public_inputs_hash, verifier_data_t.circuit_digest,
        common)

    A = CircuitExtAlgebra(b)
    zeta = challenges["plonk_zeta"]
    openings = proof_t.openings
    vars = EvaluationVars(
        list(openings.constants), list(openings.wires),
        [b.convert_to_ext(t) for t in public_inputs_hash])

    # reference recursive_verifier.rs:66 registers `one` before anything else
    one_ext = b.one_extension()
    zeta_pow_deg = gd.exp_power_of_2_extension(b, zeta, common.degree_bits)

    # L_0(zeta) ops are emitted INSIDE eval_vanishing_poly, after the gate
    # constraints (reference vanishing_poly.rs:902 -> plonk_common.rs:75-101)
    def l_0_zeta():
        return eval_l_0_circuit(b, common.degree, zeta, zeta_pow_deg)

    deltas = challenges.get("plonk_deltas", [])
    lut_re_evals = (get_lut_re_evals_circuit(b, common, deltas)
                    if common.num_lookup_polys else [])
    vanishing_zeta = vanishing.eval_vanishing_poly(
        A, common, zeta, l_0_zeta, vars,
        list(openings.plonk_zs), list(openings.plonk_zs_next),
        list(openings.partial_products), list(openings.plonk_sigmas),
        challenges["plonk_betas"], challenges["plonk_gammas"],
        challenges["plonk_alphas"], deltas=deltas,
        local_lookup_zs=list(openings.lookup_zs or []),
        next_lookup_zs=list(openings.lookup_zs_next or []),
        lut_re_evals=lut_re_evals)

    # quotient identity: vanishing_i(zeta) == Z_H(zeta) *
    #   reduce(chunk_i, zeta^n) — one shared ReducingFactorTarget and
    #   z_h_zeta emitted here, after vanishing (reference
    #   recursive_verifier.rs:107-119)
    qdf = common.quotient_degree_factor
    scale = gd.ReducingFactorTarget(zeta_pow_deg)
    z_h_zeta = b.sub_extension(zeta_pow_deg, one_ext)
    for i in range(common.config.num_challenges):
        chunk = openings.quotient_polys[i * qdf:(i + 1) * qdf]
        recombined = scale.reduce(list(chunk), b)
        rhs = b.mul_extension(z_h_zeta, recombined)
        b.connect_extension(vanishing_zeta[i], rhs)

    merkle_caps = [
        verifier_data_t.constants_sigmas_cap,
        proof_t.wires_cap,
        proof_t.plonk_zs_partial_products_cap,
        proof_t.quotient_polys_cap,
    ]
    instance = get_fri_instance_target(b, common, zeta)
    fric.verify_fri_proof_circuit(
        b, instance, openings.to_fri_openings(), challenges, merkle_caps,
        proof_t.opening_proof, common.fri_params)


# -- witness assignment (reference iop/witness.rs:76-160,
#    fri/witness_util.rs) --------------------------------------------------


def set_proof_with_pis_target(pw: PartialWitness,
                              proof_t: ProofWithPublicInputsTarget,
                              proof_with_pis):
    proof = proof_with_pis.proof
    for t, v in zip(proof_t.public_inputs, proof_with_pis.public_inputs):
        pw.set_target(t, int(v))
    _set_cap(pw, proof_t.proof.wires_cap, proof.wires_cap)
    _set_cap(pw, proof_t.proof.plonk_zs_partial_products_cap,
             proof.plonk_zs_partial_products_cap)
    _set_cap(pw, proof_t.proof.quotient_polys_cap, proof.quotient_polys_cap)

    ot, o = proof_t.proof.openings, proof.openings
    for ts, vs in [(ot.constants, o.constants),
                   (ot.plonk_sigmas, o.plonk_sigmas),
                   (ot.wires, o.wires),
                   (ot.plonk_zs, o.plonk_zs),
                   (ot.plonk_zs_next, o.plonk_zs_next),
                   (ot.partial_products, o.partial_products),
                   (ot.quotient_polys, o.quotient_polys),
                   (ot.lookup_zs or [], o.lookup_zs),
                   (ot.lookup_zs_next or [], o.lookup_zs_next)]:
        assert len(ts) == len(vs), (len(ts), len(vs))
        for t, v in zip(ts, vs):
            _set_ext(pw, t, v)

    ft, f = proof_t.proof.opening_proof, proof.opening_proof
    for cap_t, cap in zip(ft.commit_phase_merkle_caps,
                          f.commit_phase_merkle_caps):
        _set_cap(pw, cap_t, cap)
    for t, v in zip(ft.final_poly, f.final_poly):
        _set_ext(pw, t, v)
    pw.set_target(ft.pow_witness, int(f.pow_witness))
    for round_t, round_ in zip(ft.query_round_proofs, f.query_round_proofs):
        for (leaf_t, sib_t), (leaf, sib) in zip(
                round_t.initial_trees_proof.evals_proofs,
                round_.initial_trees_proof.evals_proofs):
            for t, v in zip(leaf_t, leaf):
                pw.set_target(t, int(v))
            _set_digests(pw, sib_t, sib)
        for step_t, step in zip(round_t.steps, round_.steps):
            for t, v in zip(step_t.evals, step.evals):
                _set_ext(pw, t, v)
            _set_digests(pw, step_t.merkle_proof, step.merkle_proof)


def set_verifier_data_target(pw: PartialWitness,
                             vk_t: VerifierCircuitTarget, verifier_only):
    _set_cap(pw, vk_t.constants_sigmas_cap,
             verifier_only.constants_sigmas_cap)
    for t, v in zip(vk_t.circuit_digest, verifier_only.circuit_digest):
        pw.set_target(t, int(v))


def _set_ext(pw, t, v):
    for tt, vv in zip(t, v):
        pw.set_target(tt, int(vv))


def _set_digests(pw, ts, vs):
    assert len(ts) == len(vs), (len(ts), len(vs))
    for dt, dv in zip(ts, vs):
        for t, v in zip(dt, dv):
            pw.set_target(t, int(v))


def _set_cap(pw, cap_t, cap):
    _set_digests(pw, cap_t, cap)
