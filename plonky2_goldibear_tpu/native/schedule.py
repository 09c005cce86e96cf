"""Witness-generation schedule: record once, replay natively.

The reference's generator scheduler (plonky2/src/iop/generator.rs:25-106) is
a watch-list fixpoint.  Its execution ORDER depends only on the circuit
structure and on WHICH inputs are pre-set — not on their values — so one
recorded fixpoint run yields a valid static topological schedule for every
subsequent proof with the same input-target set.  We lower that schedule to
native VM segments (native/lower.py → witgen.c) with Python fallback
segments for generators that must stay on host (randomness, which replays
the host RNG stream in recorded order).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..iop.witness import PartialWitness, PartitionWitness
from . import engine
from .lower import Ctx, Prog, lowerer_for


class CompiledSchedule:
    def __init__(self, segments: List[Tuple[str, object]], num_reps: int,
                 max_temps: int, p: int, n_native: int, n_python: int):
        self.segments = segments
        self.num_reps = num_reps
        self.max_temps = max_temps
        self.p = p
        self.n_native = n_native
        self.n_python = n_python

    def replay(self, inputs: PartialWitness, prover_data,
               common) -> PartitionWitness:
        config = common.config
        vals = np.zeros(self.num_reps + self.max_temps, dtype=np.uint64)
        filled = np.zeros(self.num_reps, dtype=np.uint8)
        witness = PartitionWitness(
            config.num_wires, common.degree, prover_data.representative_map,
            vals=vals, filled=filled)
        for t, v in inputs.target_values.items():
            witness.set_target(t, v)
        generators = prover_data.generators
        buffer: List = []
        for kind, payload in self.segments:
            if kind == "native":
                code, pool = payload
                engine.run(self.p, code, pool, vals, filled, self.num_reps)
            else:
                for gi in payload:
                    generators[gi].run_once(witness, buffer)
                    for t, v in buffer:
                        witness.set_target(t, v)
                    buffer.clear()
        return witness


def compile_schedule(order: List[int], prover_data,
                     common) -> CompiledSchedule:
    """Lower the recorded execution order into native + Python segments."""
    config = common.config
    spec = common.spec
    generators = prover_data.generators
    rep_map = prover_data.representative_map
    num_reps = len(rep_map)

    segments: List[Tuple[str, object]] = []
    max_temps = 0
    n_native = n_python = 0
    prog = None
    py_run: List[int] = []

    def flush_native():
        nonlocal prog, max_temps
        if prog is not None and prog.code:
            segments.append(("native", prog.arrays()))
            max_temps = max(max_temps, prog.n_temps)
        prog = None

    def flush_python():
        nonlocal py_run
        if py_run:
            segments.append(("python", py_run))
            py_run = []

    for gi in order:
        g = generators[gi]
        fn = lowerer_for(g)
        if fn is None:
            flush_native()
            py_run.append(gi)
            n_python += 1
        else:
            flush_python()
            if prog is None:
                prog = Prog(num_reps, spec.p)
            fn(g, Ctx(prog, spec, rep_map, config.num_wires, common.degree))
            n_native += 1
    flush_native()
    flush_python()
    return CompiledSchedule(segments, num_reps, max_temps, spec.p,
                            n_native, n_python)
