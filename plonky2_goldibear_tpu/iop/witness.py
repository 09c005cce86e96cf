"""Witness containers (reference plonky2/src/iop/witness.rs:277-385).

- ``PartialWitness``: user-provided target assignments (dict).
- ``PartitionWitness``: values keyed by the disjoint-set *representative*
  index so copy-constrained targets share one slot (witness.rs:321-385).
- ``full_witness``: densify to a (num_wires, degree) numpy matrix (the
  ``MatrixWitness``), which becomes the device input of the prover — the
  same host/device phase split as the reference (prover.rs:151-158).

Values are canonical field elements as python ints (host side is exact; the
dense matrix is uint64).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from . import target as tgt


class PartialWitness:
    def __init__(self):
        self.target_values: Dict[tgt.Target, int] = {}

    def set_target(self, t: tgt.Target, value: int):
        if t in self.target_values:
            assert self.target_values[t] == value, \
                f"contradictory assignment for {t}"
        else:
            self.target_values[t] = value

    def set_targets(self, ts: Sequence[tgt.Target], values: Sequence[int]):
        for t, v in zip(ts, values):
            self.set_target(t, v)


class PartitionWitness:
    """Witness keyed by representative index (copy classes share slots).

    Storage is a dense uint64 value array plus a filled bitmap — the SAME
    buffers the native witness VM (native/witgen.c) executes over, so Python
    fallback generators and native segments share one address space.  The
    ``vals`` buffer may be larger than the rep count (VM temporaries live
    past ``num_reps``); only the first ``len(rep)`` slots are witness state.
    """

    def __init__(self, num_wires: int, degree: int,
                 representative_map: np.ndarray,
                 vals: Optional[np.ndarray] = None,
                 filled: Optional[np.ndarray] = None):
        self.num_wires = num_wires
        self.degree = degree
        self.rep = representative_map  # dense index -> representative index
        n = len(representative_map)
        self.vals = vals if vals is not None else np.zeros(n, np.uint64)
        self.filled = (filled if filled is not None
                       else np.zeros(n, np.uint8))

    def index(self, t: tgt.Target) -> int:
        return tgt.target_index(t, self.num_wires, self.degree)

    def try_get_target(self, t: tgt.Target) -> Optional[int]:
        rep = self.rep[self.index(t)]
        if not self.filled[rep]:
            return None
        return int(self.vals[rep])

    def get_target(self, t: tgt.Target) -> int:
        rep = self.rep[self.index(t)]
        assert self.filled[rep], f"target {t} not set"
        return int(self.vals[rep])

    def get_targets(self, ts: Sequence[tgt.Target]) -> List[int]:
        return [self.get_target(t) for t in ts]

    def contains(self, t: tgt.Target) -> bool:
        return bool(self.filled[self.rep[self.index(t)]])

    def contains_all(self, ts: Sequence[tgt.Target]) -> bool:
        return all(self.contains(t) for t in ts)

    def set_target_returning_rep(self, t: tgt.Target, value: int) -> Optional[int]:
        """Set; returns the representative index if newly populated
        (reference witness.rs set_target_returning_rep semantics)."""
        rep = self.rep[self.index(t)]
        if not self.filled[rep]:
            self.filled[rep] = 1
            self.vals[rep] = value
            return int(rep)
        assert int(self.vals[rep]) == value, \
            f"contradictory assignment for {t}: {int(self.vals[rep])} " \
            f"vs {value}"
        return None

    def set_target(self, t: tgt.Target, value: int):
        self.set_target_returning_rep(t, value)

    def full_witness(self) -> np.ndarray:
        """Dense (num_wires, degree) uint64 matrix; unset wires are zero
        (reference witness.rs:359 MatrixWitness layout is
        wire_values[column][row])."""
        # dense index = row * num_wires + column
        reps = self.rep[: self.degree * self.num_wires].reshape(
            self.degree, self.num_wires)
        dense = np.where(self.filled[reps].astype(bool),
                         self.vals[reps], np.uint64(0))
        return dense.T.copy()
