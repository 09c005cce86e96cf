"""Conditional, dummy-based and cyclic (IVC) recursion
(reference plonky2/src/recursion/{conditional_recursive_verifier.rs,
dummy_circuit.rs, cyclic_recursion.rs}).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from ..gates.basic_gates import NoopGate
from ..iop.witness import PartialWitness
from ..plonk import gadgets as gd
from . import recursive_verifier as rv


# -- structural select gadgets -------------------------------------------------


def select_ext(b, cond, x, y):
    return gd.select_ext(b, cond, x, y)


def select_vec(b, cond, v0, v1):
    return [gd.select(b, cond, x, y) for x, y in zip(v0, v1)]


def select_hash(b, cond, h0, h1):
    return select_vec(b, cond, h0, h1)


def select_cap(b, cond, c0, c1):
    return [select_hash(b, cond, h0, h1) for h0, h1 in zip(c0, c1)]


def select_ext_vec(b, cond, v0, v1):
    return [select_ext(b, cond, x, y) for x, y in zip(v0, v1)]


def _select_opening_set(b, cond, o0, o1):
    return rv.OpeningSetTarget(
        constants=select_ext_vec(b, cond, o0.constants, o1.constants),
        plonk_sigmas=select_ext_vec(b, cond, o0.plonk_sigmas,
                                    o1.plonk_sigmas),
        wires=select_ext_vec(b, cond, o0.wires, o1.wires),
        plonk_zs=select_ext_vec(b, cond, o0.plonk_zs, o1.plonk_zs),
        plonk_zs_next=select_ext_vec(b, cond, o0.plonk_zs_next,
                                     o1.plonk_zs_next),
        partial_products=select_ext_vec(b, cond, o0.partial_products,
                                        o1.partial_products),
        quotient_polys=select_ext_vec(b, cond, o0.quotient_polys,
                                      o1.quotient_polys))


def _select_fri_proof(b, cond, f0, f1):
    from ..fri.recursive_verifier import (FriInitialTreeProofTarget,
                                          FriProofTarget, FriQueryRoundTarget,
                                          FriQueryStepTarget)
    caps = [select_cap(b, cond, c0, c1)
            for c0, c1 in zip(f0.commit_phase_merkle_caps,
                              f1.commit_phase_merkle_caps)]
    rounds = []
    for r0, r1 in zip(f0.query_round_proofs, f1.query_round_proofs):
        evals_proofs = []
        for (l0, s0), (l1, s1) in zip(r0.initial_trees_proof.evals_proofs,
                                      r1.initial_trees_proof.evals_proofs):
            evals_proofs.append((select_vec(b, cond, l0, l1),
                                 select_cap(b, cond, s0, s1)))
        steps = []
        for st0, st1 in zip(r0.steps, r1.steps):
            steps.append(FriQueryStepTarget(
                evals=select_ext_vec(b, cond, st0.evals, st1.evals),
                merkle_proof=select_cap(b, cond, st0.merkle_proof,
                                        st1.merkle_proof)))
        rounds.append(FriQueryRoundTarget(
            initial_trees_proof=FriInitialTreeProofTarget(evals_proofs),
            steps=steps))
    return FriProofTarget(
        commit_phase_merkle_caps=caps, query_round_proofs=rounds,
        final_poly=select_ext_vec(b, cond, f0.final_poly, f1.final_poly),
        pow_witness=gd.select(b, cond, f0.pow_witness, f1.pow_witness))


def select_proof_with_pis(b, cond, p0: rv.ProofWithPublicInputsTarget,
                          p1: rv.ProofWithPublicInputsTarget
                          ) -> rv.ProofWithPublicInputsTarget:
    """reference conditional_recursive_verifier.rs:84-135."""
    return rv.ProofWithPublicInputsTarget(
        proof=rv.ProofTarget(
            wires_cap=select_cap(b, cond, p0.proof.wires_cap,
                                 p1.proof.wires_cap),
            plonk_zs_partial_products_cap=select_cap(
                b, cond, p0.proof.plonk_zs_partial_products_cap,
                p1.proof.plonk_zs_partial_products_cap),
            quotient_polys_cap=select_cap(b, cond,
                                          p0.proof.quotient_polys_cap,
                                          p1.proof.quotient_polys_cap),
            openings=_select_opening_set(b, cond, p0.proof.openings,
                                         p1.proof.openings),
            opening_proof=_select_fri_proof(b, cond, p0.proof.opening_proof,
                                            p1.proof.opening_proof)),
        public_inputs=select_vec(b, cond, p0.public_inputs,
                                 p1.public_inputs))


# -- conditional verification --------------------------------------------------


def conditionally_verify_proof(b, condition, proof0, vk0, proof1, vk1,
                               inner_common):
    """Verify proof0 if condition else proof1 (same CommonCircuitData;
    reference conditional_recursive_verifier.rs:26-56)."""
    selected = select_proof_with_pis(b, condition, proof0, proof1)
    selected_vk = rv.VerifierCircuitTarget(
        constants_sigmas_cap=select_cap(b, condition,
                                        vk0.constants_sigmas_cap,
                                        vk1.constants_sigmas_cap),
        circuit_digest=select_hash(b, condition, vk0.circuit_digest,
                                   vk1.circuit_digest))
    rv.verify_proof(b, selected, selected_vk, inner_common)


def conditionally_verify_proof_or_dummy(b, condition, proof, vk,
                                        inner_common):
    """reference conditional_recursive_verifier.rs:58-82."""
    dummy_proof_t, dummy_vk_t = dummy_proof_and_vk(b, inner_common)
    conditionally_verify_proof(b, condition, proof, vk, dummy_proof_t,
                               dummy_vk_t, inner_common)


# -- dummy circuits (reference dummy_circuit.rs) -------------------------------


def dummy_circuit(common):
    """A NoopGate-only circuit matching common's shape
    (reference dummy_circuit.rs:92-130)."""
    from ..plonk.builder import CircuitBuilder
    assert not common.config.zero_knowledge
    degree = common.degree
    # account for PI hashing rows (one sponge absorb per RATE inputs), the
    # PublicInputGate and one ConstantGate (reference dummy_circuit.rs:111)
    num_noop = degree - -(-common.num_public_inputs // 8) - 2
    builder = CircuitBuilder(common.config, spec=common.spec)
    for _ in range(num_noop):
        builder.add_gate(NoopGate(), [])
    for g in common.gates:
        builder.add_gate_to_gate_set(g)
    for _ in range(common.num_public_inputs):
        t = builder.add_virtual_target()
        builder.register_public_input(t)
    data = builder.build()
    assert data.common == common, "dummy circuit shape mismatch"
    return data


def dummy_proof(circuit, nonzero_public_inputs: Dict[int, int]):
    """reference dummy_circuit.rs:72-89."""
    pw = PartialWitness()
    for i in range(circuit.common.num_public_inputs):
        pw.set_target(circuit.prover_only.public_inputs[i],
                      nonzero_public_inputs.get(i, 0))
    return circuit.prove(pw)


class _DummyProofGenerator:
    """Sets a proof target at witness-generation time
    (reference dummy_circuit.rs:163-240)."""

    def __init__(self, proof_t, proof, vk_t, vk):
        self.proof_t, self.proof = proof_t, proof
        self.vk_t, self.vk = vk_t, vk

    def watch_list(self):
        return []

    def dependencies(self):
        return []

    def run(self, witness, out):
        pw = PartialWitness()
        rv.set_proof_with_pis_target(pw, self.proof_t, self.proof)
        rv.set_verifier_data_target(pw, self.vk_t, self.vk)
        out.extend(pw.target_values.items())
        return True


def dummy_proof_and_vk(b, common) -> Tuple:
    """reference dummy_circuit.rs:132-159."""
    circuit = dummy_circuit(common)
    proof = dummy_proof(circuit, {})
    proof_t = rv.add_virtual_proof_with_pis(b, common)
    vk_t = rv.add_virtual_verifier_data(b, common.config.fri_config.cap_height)
    b.add_simple_generator(_DummyProofGenerator(
        proof_t, proof, vk_t, circuit.verifier_only))
    return proof_t, vk_t


# -- cyclic recursion (IVC, reference cyclic_recursion.rs) ---------------------


def vk_from_public_inputs(public_inputs, common):
    """Extract (circuit_digest, cap) from the tail of the public inputs
    (layout set by add_verifier_data_public_inputs)."""
    n = common.spec.num_hash_out_elts
    cap_elements = 1 << common.config.fri_config.cap_height
    start = len(public_inputs) - n - n * cap_elements
    digest = list(public_inputs[start:start + n])
    cap = [list(public_inputs[start + n + n * i:start + n + n * (i + 1)])
           for i in range(cap_elements)]
    return digest, cap


def add_verifier_data_public_inputs(b) -> rv.VerifierCircuitTarget:
    """reference circuit_builder.rs:452-467."""
    assert getattr(b, "verifier_data_public_input", None) is None
    vk = rv.add_virtual_verifier_data(b, b.config.fri_config.cap_height)
    b.register_public_inputs(vk.circuit_digest)
    for h in vk.constants_sigmas_cap:
        b.register_public_inputs(h)
    b.verifier_data_public_input = vk
    return vk


def conditionally_verify_cyclic_proof_or_dummy(b, condition,
                                               cyclic_proof_with_pis,
                                               common):
    """reference cyclic_recursion.rs:115-195."""
    vk = getattr(b, "verifier_data_public_input", None)
    assert vk is not None, \
        "call add_verifier_data_public_inputs before cyclic recursion"
    if getattr(b, "goal_common_data", None) is not None:
        assert b.goal_common_data == common
    else:
        b.goal_common_data = common

    inner_digest, inner_cap = vk_from_public_inputs(
        cyclic_proof_with_pis.public_inputs, common)
    for t, u in zip(inner_digest, vk.circuit_digest):
        b.connect(t, u)
    for h_t, h_u in zip(inner_cap, vk.constants_sigmas_cap):
        for t, u in zip(h_t, h_u):
            b.connect(t, u)

    dummy_proof_t, dummy_vk_t = dummy_proof_and_vk(b, common)
    conditionally_verify_proof(b, condition, cyclic_proof_with_pis, vk,
                               dummy_proof_t, dummy_vk_t, common)
    for g in common.gates:
        b.add_gate_to_gate_set(g)


def cyclic_base_proof(common, verifier_only,
                      nonzero_public_inputs: Optional[Dict[int, int]] = None):
    """Base-case proof with the cyclic vk embedded in the public inputs
    (reference dummy_circuit.rs:37-68)."""
    pis = dict(nonzero_public_inputs or {})
    n = common.spec.num_hash_out_elts
    cap_elements = 1 << common.config.fri_config.cap_height
    start = common.num_public_inputs - n - n * cap_elements
    for j, v in enumerate(verifier_only.circuit_digest):
        pis[start + j] = int(v)
    for i in range(cap_elements):
        for j, v in enumerate(verifier_only.constants_sigmas_cap[i]):
            pis[start + n + n * i + j] = int(v)
    return dummy_proof(dummy_circuit(common), pis)


def check_cyclic_proof_verifier_data(proof_with_pis, verifier_only, common):
    """reference cyclic_recursion.rs:197-230."""
    digest, cap = vk_from_public_inputs(proof_with_pis.public_inputs, common)
    assert digest == list(verifier_only.circuit_digest), \
        "cyclic vk digest mismatch"
    assert cap == [list(h) for h in verifier_only.constants_sigmas_cap], \
        "cyclic vk cap mismatch"


def common_data_for_recursion(config, spec=None, min_degree_bits: int = 12):
    """Self-consistent CommonCircuitData for cyclic recursion: build an
    empty circuit, wrap it in a recursive verifier twice (the shape reaches
    a fixed point), and pad to 2^min_degree_bits (reference
    cyclic_recursion.rs test helper common_data_for_recursion)."""
    from ..gates.basic_gates import NoopGate
    from ..plonk.builder import CircuitBuilder

    kwargs = {} if spec is None else {"spec": spec}
    b = CircuitBuilder(config, **kwargs)
    data = b.build()
    for _ in range(2):
        b = CircuitBuilder(config, **kwargs)
        proof_t = rv.add_virtual_proof_with_pis(b, data.common)
        vk_t = rv.add_virtual_verifier_data(
            b, data.common.config.fri_config.cap_height)
        rv.verify_proof(b, proof_t, vk_t, data.common)
        if data.common.degree_bits >= min_degree_bits:
            while b.num_gates() < (1 << min_degree_bits) - 100:
                b.add_gate(NoopGate(), [])
        data = b.build()
    return data.common
