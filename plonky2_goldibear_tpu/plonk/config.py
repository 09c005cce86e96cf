"""Circuit / FRI configuration (reference plonky2/src/plonk/circuit_data.rs:55-190,
fri/mod.rs:26-115, fri/reduction_strategies.rs:11-56).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Tuple

from ..field import host


@dataclass(frozen=True)
class FriReductionStrategy:
    """kind: "fixed" | "constant_arity" | "min_size"
    (reference fri/reduction_strategies.rs:11-27)."""

    kind: str = "constant_arity"
    fixed: Tuple[int, ...] = ()
    arity_bits: int = 4
    final_poly_bits: int = 5
    max_arity_bits: Optional[int] = None

    def reduction_arity_bits(self, degree_bits: int, rate_bits: int,
                             cap_height: int, num_queries: int) -> List[int]:
        if self.kind == "fixed":
            return list(self.fixed)
        if self.kind == "constant_arity":
            out = []
            db = degree_bits
            while (db > self.final_poly_bits
                   and db + rate_bits - self.arity_bits >= cap_height):
                assert db >= self.arity_bits
                out.append(self.arity_bits)
                db -= self.arity_bits
            return out
        if self.kind == "min_size":
            return _min_size_arity_bits(degree_bits, rate_bits, num_queries,
                                        self.max_arity_bits or 4)
        raise ValueError(self.kind)


def _relative_proof_size(degree_bits, rate_bits, num_queries, arity_bits):
    """reference fri/reduction_strategies.rs:133-161 (D=4 convention)."""
    D = 4
    current = degree_bits + rate_bits
    total = 0
    for ab in arity_bits:
        total += ((1 << ab) - 1) * D * num_queries
        total += current * 4 * num_queries
        current -= ab
    assert current >= rate_bits
    return total + D * (1 << (current - rate_bits))


def _min_size_arity_bits(degree_bits, rate_bits, num_queries,
                         max_arity_bits, prefix=()):
    """Exhaustive monotone search minimizing estimated proof size
    (reference fri/reduction_strategies.rs:58-130)."""
    current_layer = degree_bits + rate_bits - sum(prefix)
    best = list(prefix)
    best_size = _relative_proof_size(degree_bits, rate_bits, num_queries,
                                     prefix)
    local_max = min(prefix[-1] if prefix else max_arity_bits,
                    current_layer - rate_bits)
    for nxt in range(1, local_max + 1):
        cand, size = _min_size_helper(degree_bits, rate_bits, num_queries,
                                      local_max, tuple(prefix) + (nxt,))
        if size < best_size:
            best, best_size = cand, size
    return best


def _min_size_helper(degree_bits, rate_bits, num_queries, max_arity_bits,
                     prefix):
    best = _min_size_arity_bits(degree_bits, rate_bits, num_queries,
                                max_arity_bits, prefix)
    return best, _relative_proof_size(degree_bits, rate_bits, num_queries,
                                      best)


@dataclass(frozen=True)
class FriConfig:
    rate_bits: int
    cap_height: int
    proof_of_work_bits: int
    reduction_strategy: FriReductionStrategy
    num_query_rounds: int

    def fri_params(self, degree_bits: int, hiding: bool) -> "FriParams":
        return FriParams(
            config=self,
            hiding=hiding,
            degree_bits=degree_bits,
            reduction_arity_bits=tuple(
                self.reduction_strategy.reduction_arity_bits(
                    degree_bits, self.rate_bits, self.cap_height,
                    self.num_query_rounds)),
        )


@dataclass(frozen=True)
class FriParams:
    config: FriConfig
    hiding: bool
    degree_bits: int
    reduction_arity_bits: Tuple[int, ...]

    @property
    def lde_bits(self) -> int:
        return self.degree_bits + self.config.rate_bits

    @property
    def lde_size(self) -> int:
        return 1 << self.lde_bits

    def total_arities(self) -> int:
        return sum(self.reduction_arity_bits)

    @property
    def final_poly_len(self) -> int:
        return 1 << (self.degree_bits - self.total_arities())


@dataclass(frozen=True)
class CircuitConfig:
    num_wires: int
    num_routed_wires: int
    num_constants: int
    use_base_arithmetic_gate: bool
    security_bits: int
    num_challenges: int
    zero_knowledge: bool
    max_quotient_degree_factor: int
    fri_config: FriConfig

    @property
    def num_advice_wires(self) -> int:
        return self.num_wires - self.num_routed_wires

    # -- presets (reference circuit_data.rs:102-187) ------------------------

    @staticmethod
    def _standard_base(arity_bits: int = 3) -> "CircuitConfig":
        return CircuitConfig(
            num_wires=0, num_routed_wires=80, num_constants=2,
            use_base_arithmetic_gate=True, security_bits=100,
            num_challenges=0, zero_knowledge=False,
            max_quotient_degree_factor=8,
            fri_config=FriConfig(
                rate_bits=3, cap_height=4, proof_of_work_bits=16,
                reduction_strategy=FriReductionStrategy(
                    kind="constant_arity", arity_bits=arity_bits,
                    final_poly_bits=5),
                num_query_rounds=28))

    @staticmethod
    def standard_recursion_config_gl() -> "CircuitConfig":
        base = CircuitConfig._standard_base()
        return replace(base, num_wires=135, num_challenges=2,
                       fri_config=replace(
                           base.fri_config,
                           reduction_strategy=FriReductionStrategy(
                               kind="constant_arity", arity_bits=4,
                               final_poly_bits=5)))

    @staticmethod
    def recursion_config_bb_narrow() -> "CircuitConfig":
        return replace(CircuitConfig._standard_base(),
                       num_wires=167, num_routed_wires=41, num_challenges=6)

    @staticmethod
    def recursion_config_bb_wide() -> "CircuitConfig":
        return replace(CircuitConfig._standard_base(),
                       num_wires=334, num_routed_wires=160, num_challenges=6)

    @staticmethod
    def standard_recursion_config_bb() -> "CircuitConfig":
        return CircuitConfig.recursion_config_bb_narrow()

    @staticmethod
    def standard_recursion_zk_config_gl() -> "CircuitConfig":
        return replace(CircuitConfig.standard_recursion_config_gl(),
                       zero_knowledge=True)
