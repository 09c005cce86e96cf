"""Circuit data: common / prover-only / verifier-only
(reference plonky2/src/plonk/circuit_data.rs:191-740).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..field import host
from ..gates.selectors import SelectorsInfo
from .config import CircuitConfig, FriParams

# FRI oracle indices (reference plonk/plonk_common.rs:19-41)
ORACLE_CONSTANTS_SIGMAS = 0
ORACLE_WIRES = 1
ORACLE_ZS_PARTIAL_PRODUCTS = 2
ORACLE_QUOTIENT = 3

# (oracle blinding flags, reference plonk_common.rs:24-40)
ORACLE_BLINDING = [False, True, True, True]


@dataclass
class FriOracleInfo:
    num_polys: int
    blinding: bool


@dataclass
class FriPolynomialInfo:
    oracle_index: int
    polynomial_index: int

    @staticmethod
    def from_range(oracle_index: int, start: int, end: int):
        return [FriPolynomialInfo(oracle_index, i) for i in range(start, end)]


@dataclass
class FriBatchInfo:
    point: Tuple[int, ...]               # extension point
    polynomials: List[FriPolynomialInfo]
    # claimed opening values (filled by the prover/verifier from the
    # OpeningSet before running FRI; mirrors FriOpenings batches)
    values: Optional[List[Tuple[int, ...]]] = None


@dataclass
class FriInstanceInfo:
    oracles: List[FriOracleInfo]
    batches: List[FriBatchInfo]


@dataclass
class CommonCircuitData:
    config: CircuitConfig
    spec: host.FieldSpec
    fri_params: FriParams
    gates: List                      # sorted unique gates
    selectors_info: SelectorsInfo
    quotient_degree_factor: int
    num_gate_constraints: int
    num_constants: int               # selectors + lookup selectors + consts
    num_public_inputs: int
    k_is: List[int]
    num_partial_products: int
    num_lookup_polys: int = 0
    num_lookup_selectors: int = 0
    luts: List = field(default_factory=list)

    # -- derived (reference circuit_data.rs:598-660) ------------------------

    @property
    def degree_bits(self) -> int:
        return self.fri_params.degree_bits

    @property
    def degree(self) -> int:
        return 1 << self.degree_bits

    @property
    def lde_size(self) -> int:
        return self.fri_params.lde_size

    @property
    def quotient_degree(self) -> int:
        return self.quotient_degree_factor * self.degree

    def constants_range(self):
        return (0, self.num_constants)

    def sigmas_range(self):
        return (self.num_constants,
                self.num_constants + self.config.num_routed_wires)

    def zs_range(self):
        return (0, self.config.num_challenges)

    def partial_products_range(self):
        return (self.config.num_challenges,
                (self.num_partial_products + 1) * self.config.num_challenges)

    def num_zs_partial_products_polys(self) -> int:
        return (self.num_partial_products + 1) * self.config.num_challenges

    def num_all_lookup_polys(self) -> int:
        return self.config.num_challenges * self.num_lookup_polys

    def num_preprocessed_polys(self) -> int:
        return self.sigmas_range()[1]

    def num_quotient_polys(self) -> int:
        return self.config.num_challenges * self.quotient_degree_factor

    def fri_oracles(self) -> List[FriOracleInfo]:
        return [
            FriOracleInfo(self.num_preprocessed_polys(), ORACLE_BLINDING[0]),
            FriOracleInfo(self.config.num_wires, ORACLE_BLINDING[1]),
            FriOracleInfo(self.num_zs_partial_products_polys()
                          + self.num_all_lookup_polys(), ORACLE_BLINDING[2]),
            FriOracleInfo(self.num_quotient_polys(), ORACLE_BLINDING[3]),
        ]

    def get_fri_instance(self, zeta: Tuple[int, ...]) -> FriInstanceInfo:
        """Two opening batches: everything at zeta; Zs (+lookups) at g*zeta
        (reference circuit_data.rs:658-706)."""
        all_polys = (
            FriPolynomialInfo.from_range(ORACLE_CONSTANTS_SIGMAS, 0,
                                         self.num_preprocessed_polys())
            + FriPolynomialInfo.from_range(ORACLE_WIRES, 0,
                                           self.config.num_wires)
            + FriPolynomialInfo.from_range(
                ORACLE_ZS_PARTIAL_PRODUCTS, 0,
                self.num_zs_partial_products_polys())
            + FriPolynomialInfo.from_range(ORACLE_QUOTIENT, 0,
                                           self.num_quotient_polys())
            + FriPolynomialInfo.from_range(
                ORACLE_ZS_PARTIAL_PRODUCTS,
                self.num_zs_partial_products_polys(),
                self.num_zs_partial_products_polys()
                + self.num_all_lookup_polys()))
        zeta_batch = FriBatchInfo(point=zeta, polynomials=all_polys)

        g = host.ext_from_base(self.spec,
                               self.spec.two_adic_generator(self.degree_bits))
        zeta_next = host.ext_mul(self.spec, g, zeta)
        next_polys = (
            FriPolynomialInfo.from_range(ORACLE_ZS_PARTIAL_PRODUCTS, 0,
                                         self.config.num_challenges)
            + FriPolynomialInfo.from_range(
                ORACLE_ZS_PARTIAL_PRODUCTS,
                self.num_zs_partial_products_polys(),
                self.num_zs_partial_products_polys()
                + self.num_all_lookup_polys()))
        zeta_next_batch = FriBatchInfo(point=zeta_next,
                                       polynomials=next_polys)
        return FriInstanceInfo(oracles=self.fri_oracles(),
                               batches=[zeta_batch, zeta_next_batch])


@dataclass
class VerifierOnlyCircuitData:
    constants_sigmas_cap: List[List[int]]
    circuit_digest: List[int]


@dataclass
class ProverOnlyCircuitData:
    generators: List
    generator_indices_by_watches: Dict[int, List[int]]
    constants_sigmas_commitment: object    # fri.oracle.PolynomialBatch
    sigmas: np.ndarray                     # (num_routed_wires, degree) u64
    subgroup: List[int]
    public_inputs: List
    representative_map: np.ndarray
    circuit_digest: List[int]
    random_wire: Optional[Tuple[int, int]] = None   # (row, column)
    lookup_rows: List[Tuple[int, int, int]] = field(default_factory=list)
    lut_to_lookups: List[List] = field(default_factory=list)


@dataclass
class CircuitData:
    common: CommonCircuitData
    prover_only: ProverOnlyCircuitData
    verifier_only: VerifierOnlyCircuitData
    F: object = None        # device field module (field.gl / field.bb)
    hasher: object = None   # Merkle/transcript hash module (C::Hasher)
    inner_hasher: object = None   # algebraic hash module (C::InnerHasher)

    def _defaults(self):
        if self.F is None:
            from ..field import gl
            from ..hash import poseidon_gl
            return gl, poseidon_gl, poseidon_gl
        return self.F, self.hasher, self.inner_hasher or self.hasher

    def prove(self, inputs, seed: Optional[int] = None, timing=None):
        from . import prover
        F, hasher, inner_hasher = self._defaults()
        return prover.prove(self.prover_only, self.common, inputs,
                            F=F, hasher=hasher, inner_hasher=inner_hasher,
                            timing=timing)

    def verify(self, proof_with_pis) -> None:
        from . import verifier
        _, hasher, inner_hasher = self._defaults()
        verifier.verify(proof_with_pis, self.verifier_only, self.common,
                        hasher=hasher, inner_hasher=inner_hasher)
