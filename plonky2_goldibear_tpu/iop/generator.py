"""Witness generators + watch-list dataflow scheduler
(reference plonky2/src/iop/generator.rs:25-106,109-265,320-460).

Generators run on host (python ints): the dataflow is inherently sequential
and cheap per-op; the dense matrix it produces is the device input
(SURVEY.md §7 hard part (c)).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from . import target as tgt
from .witness import PartialWitness, PartitionWitness

# Deterministic-randomness hook (reference `disable-randomness` feature,
# field/src/types.rs:40-77): tests may seed this for reproducible proofs.
_RNG = np.random.default_rng()

# Bit-exact mirror of the reference's `disable-randomness` mode: a counter
# RNG (NonRandomRng, types.rs:49-77: next_u64 returns 2, 3, 4, ...) driven
# through rand-0.8.4's UniformInt::sample_single, which is what
# `rng.gen_range(0..p)` in `Sample::sample` (types.rs:114-131) executes.
# With both sides enabled, every rand_field_element call produces the SAME
# value sequence as the reference prover — the prerequisite for
# byte-identical proofs.
_NONRANDOM_COUNTER: Optional[int] = None


def set_nonrandom(enable: bool = True):
    """Enable/disable the deterministic counter RNG (and reset it to 1,
    mirroring NonRandomRng::reset)."""
    global _NONRANDOM_COUNTER
    _NONRANDOM_COUNTER = 1 if enable else None


def _nonrandom_next_u64() -> int:
    global _NONRANDOM_COUNTER
    _NONRANDOM_COUNTER += 1
    return _NONRANDOM_COUNTER & 0xFFFFFFFFFFFFFFFF


def _uniform_sample_single(p: int, bits: int, next_fn) -> int:
    """rand 0.8.4 UniformInt<uN>::sample_single for gen_range(0..p)."""
    mask = (1 << bits) - 1
    lz = bits - p.bit_length()
    zone = ((p << lz) - 1) & mask
    while True:
        v = next_fn() & mask
        prod = v * p
        hi, lo = prod >> bits, prod & mask
        if lo <= zone:
            return hi


def seed_randomness(seed: Optional[int]):
    global _RNG
    _RNG = np.random.default_rng(seed)


def rand_field_element(p: int) -> int:
    if _NONRANDOM_COUNTER is not None:
        if p > 0xFFFFFFFF:          # Goldilocks: sampled as u64
            return _uniform_sample_single(p, 64, _nonrandom_next_u64)
        # BabyBear: sampled as u32; NonRandomRng::next_u32 truncates next_u64
        return _uniform_sample_single(
            p, 32, lambda: _nonrandom_next_u64() & 0xFFFFFFFF)
    # rejection-free: draw 128 bits, reduce (bias < 2^-64)
    hi = int(_RNG.integers(0, 1 << 62, dtype=np.int64))
    lo = int(_RNG.integers(0, 1 << 62, dtype=np.int64))
    return ((hi << 62) | lo) % p


class SimpleGenerator:
    """dependencies() -> run_once when all deps are set
    (reference generator.rs:228-265)."""

    def dependencies(self) -> List[tgt.Target]:
        raise NotImplementedError

    def run_once(self, witness: PartitionWitness, out: List):
        raise NotImplementedError

    # WitnessGenerator interface
    def watch_list(self) -> List[tgt.Target]:
        return self.dependencies()

    def run(self, witness: PartitionWitness, out: List) -> bool:
        if witness.contains_all(self.dependencies()):
            self.run_once(witness, out)
            return True
        return False


class ConstantGenerator(SimpleGenerator):
    """reference generator.rs:450 + gates/constant.rs generator."""

    def __init__(self, row: int, constant_index: int, wire_index: int,
                 constant: int):
        self.row = row
        self.constant_index = constant_index
        self.wire_index = wire_index
        self.constant = constant

    def dependencies(self):
        return []

    def run_once(self, witness, out):
        out.append((tgt.wire(self.row, self.wire_index), self.constant))


class CopyGenerator(SimpleGenerator):
    """Copies a value from src to dst (reference generator.rs:320)."""

    def __init__(self, src: tgt.Target, dst: tgt.Target):
        self.src = src
        self.dst = dst

    def dependencies(self):
        return [self.src]

    def run_once(self, witness, out):
        out.append((self.dst, witness.get_target(self.src)))


class RandomValueGenerator(SimpleGenerator):
    """reference generator.rs:362."""

    def __init__(self, target: tgt.Target, p: int):
        self.target = target
        self.p = p

    def dependencies(self):
        return []

    def run_once(self, witness, out):
        out.append((self.target, rand_field_element(self.p)))


class RandomRowGenerator(SimpleGenerator):
    """One generator per blinding row (functionally = one
    RandomValueGenerator per wire, reference circuit_builder.rs:934-944;
    batched so zk blinding doesn't allocate wires-x-rows python objects)."""

    def __init__(self, row: int, wires, p: int):
        self.row = row
        self.wires = list(wires)
        self.p = p

    def dependencies(self):
        return []

    def run_once(self, witness, out):
        for w in self.wires:
            out.append((tgt.wire(self.row, w), rand_field_element(self.p)))


def generate_partial_witness(inputs: PartialWitness, prover_data,
                             common_data) -> PartitionWitness:
    """Witness generation with native replay.

    First run per (circuit, input-target set): the round-based fixpoint
    scheduler (reference generator.rs:25-106), recording the execution
    order.  The order depends only on WHICH targets are pre-set — not on
    their values — so it is a valid static schedule for every later proof;
    it is lowered to native VM segments (native/) and replayed at C speed
    (the Python fixpoint cost 29% of prove time).
    """
    from ..utils.envflags import env_flag

    config = common_data.config
    key = frozenset(
        tgt.target_index(t, config.num_wires, common_data.degree)
        for t in inputs.target_values)
    cache = getattr(prover_data, "_witgen_schedules", None)
    if cache is None:
        cache = prover_data._witgen_schedules = {}
    sched = cache.get(key)
    if sched is not None:
        return sched.replay(inputs, prover_data, common_data)

    witness, order = _fixpoint_generate(inputs, prover_data, common_data)

    from ..native import engine
    if engine.LIB is not None and \
            not env_flag("PLONKY2_TPU_DISABLE_WITGEN_NATIVE"):
        from ..native.schedule import compile_schedule
        cache[key] = compile_schedule(order, prover_data, common_data)
    return witness


def _fixpoint_generate(inputs: PartialWitness, prover_data, common_data):
    """Round-based fixpoint scheduler (reference generator.rs:25-106);
    returns (witness, completion order)."""
    config = common_data.config
    generators = prover_data.generators
    by_watches: Dict[int, List[int]] = prover_data.generator_indices_by_watches

    witness = PartitionWitness(config.num_wires, common_data.degree,
                               prover_data.representative_map)
    for t, v in inputs.target_values.items():
        witness.set_target(t, v)

    pending = list(range(len(generators)))
    expired = [False] * len(generators)
    remaining = len(generators)
    buffer: List = []
    order: List[int] = []

    while pending:
        next_pending: List[int] = []
        for gi in pending:
            if expired[gi]:
                continue
            finished = generators[gi].run(witness, buffer)
            if finished:
                expired[gi] = True
                order.append(gi)
                remaining -= 1
            for t, v in buffer:
                rep = witness.set_target_returning_rep(t, v)
                if rep is not None and rep in by_watches:
                    for wgi in by_watches[rep]:
                        if not expired[wgi]:
                            next_pending.append(wgi)
            buffer.clear()
        pending = next_pending

    assert remaining == 0, f"{remaining} generators weren't run"
    return witness, order
