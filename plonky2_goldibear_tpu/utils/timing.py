"""Hierarchical prover profiling — the counterpart of the reference's
``ProvingProcessInfo`` / timing tree (plonky2/src/util/proving_process_info.rs:8-180).

A tree of named scopes, each recording wall-clock enter/exit times, plus a
flat statistics map (e.g. permutation-argument retries).  The prover accepts
an optional tree and pushes a scope per phase; ``print()`` renders the
indented tree with durations.

Note on TPU semantics: jax dispatch is asynchronous, so a scope's wall time
only reflects device work if the scope ends with a blocking read (the
prover's phases all do — each phase's output is consumed by the host-side
Fiat-Shamir challenger).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, List, Optional


class StatisticsItem:
    PERM_ARG_RETRIES = "perm_arg_retries"


class ProvingProcessInfo:
    """Hierarchy of timed scopes + prover statistics."""

    def __init__(self, name: str = "root"):
        self.name = name
        self.enter_time = time.perf_counter()
        self.exit_time: Optional[float] = None
        self.children: List["ProvingProcessInfo"] = []
        self.statistics: Dict[str, int] = {}

    # -- scope stack ----------------------------------------------------

    def _is_open(self) -> bool:
        return self.exit_time is None

    def open_stack(self) -> str:
        """Names of currently-open scopes, outermost first."""
        stack: List[str] = []
        node: Optional[ProvingProcessInfo] = self
        while node is not None and node._is_open():
            stack.append(node.name)
            node = node.children[-1] if node.children else None
        return " > ".join(stack)

    def push(self, ctx: str) -> None:
        assert self._is_open()
        if self.children and self.children[-1]._is_open():
            self.children[-1].push(ctx)
            return
        self.children.append(ProvingProcessInfo(ctx))

    def pop(self) -> None:
        assert self._is_open()
        if self.children and self.children[-1]._is_open():
            if (self.children[-1].children
                    and self.children[-1].children[-1]._is_open()):
                self.children[-1].pop()
            else:
                self.children[-1].exit_time = time.perf_counter()
            return
        self.exit_time = time.perf_counter()

    @contextmanager
    def scope(self, ctx: str):
        self.push(ctx)
        try:
            yield
        finally:
            self.pop()

    def close(self) -> None:
        while self._is_open():
            self.pop()

    # -- statistics -----------------------------------------------------

    def incr(self, item: str, by: int = 1) -> None:
        self.statistics[item] = self.statistics.get(item, 0) + by

    # -- reporting ------------------------------------------------------

    def duration(self) -> float:
        end = self.exit_time if self.exit_time is not None \
            else time.perf_counter()
        return end - self.enter_time

    def lines(self, depth: int = 0) -> List[str]:
        out = [f"{'  ' * depth}{self.duration():.4f}s to {self.name}"]
        for child in self.children:
            out.extend(child.lines(depth + 1))
        return out

    def print(self, printer=print) -> None:
        for line in self.lines():
            printer(line)
        for k, v in sorted(self.statistics.items()):
            printer(f"{k}: {v}")


@contextmanager
def timed(timing: Optional[ProvingProcessInfo], ctx: str):
    """Scope helper tolerating ``timing=None`` (profiling off) — the
    counterpart of the reference's ``timed!`` macro (util/timing.rs)."""
    if timing is None:
        yield
    else:
        with timing.scope(ctx):
            yield
