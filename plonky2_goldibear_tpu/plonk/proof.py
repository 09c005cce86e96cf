"""Proof containers (reference plonky2/src/plonk/proof.rs:34-428,
fri/proof.rs).

Everything here is host-side data: digests are lists of canonical ints,
extension values are D-tuples of ints.  The device prover materializes these
at phase boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

Ext = Tuple[int, ...]
Digest = List[int]
Cap = List[Digest]


@dataclass
class FriQueryStep:
    evals: List[Ext]
    merkle_proof: List[Digest]


@dataclass
class FriInitialTreeProof:
    # one (leaf values, merkle siblings) pair per oracle
    evals_proofs: List[Tuple[List[int], List[Digest]]]

    def unsalted_eval(self, oracle_index: int, poly_index: int,
                      salted: bool, salt_size: int = 4) -> int:
        evals = self.evals_proofs[oracle_index][0]
        if salted:
            evals = evals[: len(evals) - salt_size]
        return evals[poly_index]


@dataclass
class FriQueryRound:
    initial_trees_proof: FriInitialTreeProof
    steps: List[FriQueryStep]


@dataclass
class FriProof:
    commit_phase_merkle_caps: List[Cap]
    query_round_proofs: List[FriQueryRound]
    final_poly: List[Ext]      # coefficients, low-to-high
    pow_witness: int


@dataclass
class OpeningSet:
    """Purported openings at zeta / g*zeta (reference proof.rs:334-388)."""
    constants: List[Ext]
    plonk_sigmas: List[Ext]
    wires: List[Ext]
    plonk_zs: List[Ext]
    plonk_zs_next: List[Ext]
    partial_products: List[Ext]
    quotient_polys: List[Ext]
    lookup_zs: List[Ext] = field(default_factory=list)
    lookup_zs_next: List[Ext] = field(default_factory=list)

    def to_fri_openings(self) -> List[List[Ext]]:
        """Batches of opened values in FRI order (reference proof.rs:388-428):
        batch 0 at zeta (all polys), batch 1 at g*zeta (Zs + lookups)."""
        zeta_batch = (self.constants + self.plonk_sigmas + self.wires
                      + self.plonk_zs + self.partial_products
                      + self.quotient_polys + self.lookup_zs)
        zeta_next_batch = self.plonk_zs_next + self.lookup_zs_next
        return [zeta_batch, zeta_next_batch]


@dataclass
class Proof:
    wires_cap: Cap
    plonk_zs_partial_products_cap: Cap
    quotient_polys_cap: Cap
    openings: OpeningSet
    opening_proof: FriProof


@dataclass
class ProofWithPublicInputs:
    proof: Proof
    public_inputs: List[int]
