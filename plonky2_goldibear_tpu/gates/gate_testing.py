"""Gate-level test harness (reference plonky2/src/gates/gate_testing.rs).

- ``test_low_degree``: evaluate the gate's constraints on random low-degree
  extension-valued witness polynomials and assert the resulting constraint
  degree is at most ``witness_degree * gate.degree()``.
- ``check_generated_witness``: run the gate's generators on random routed
  inputs and assert every constraint vanishes (the native half of the
  reference's ``test_eval_fns``; the circuit half lands with recursion).

Everything runs on host ints (exact), sized for sub-second execution.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence

from ..field import host
from .base import EvaluationVars, Gate, HostExtAlgebra

WITNESS_SIZE = 1 << 5


def _fft_host_ext(spec, coeffs: List, n_log: int) -> List:
    """Radix-2 NTT over ext tuples, naive-but-exact (n <= 256)."""
    n = 1 << n_log
    assert len(coeffs) == n
    perm = host.reverse_index_bits_perm(n_log)
    vals = [coeffs[perm[i]] for i in range(n)]
    for s in range(n_log):
        half = 1 << s
        g = spec.two_adic_generator(s + 1)
        w_pows = [pow(g, j, spec.p) for j in range(half)]
        for start in range(0, n, half * 2):
            for j in range(half):
                a = vals[start + j]
                b = host.ext_scalar_mul(spec, vals[start + half + j],
                                        w_pows[j])
                vals[start + j] = host.ext_add(spec, a, b)
                vals[start + half + j] = host.ext_sub(spec, a, b)
    return vals


def _ifft_host_ext(spec, values: List, n_log: int) -> List:
    n = 1 << n_log
    y = _fft_host_ext(spec, values, n_log)
    n_inv = host.finv(n, spec.p)
    return [host.ext_scalar_mul(spec, y[(n - k) % n], n_inv)
            for k in range(n)]


def _random_low_degree_values(spec, rng, rate_bits: int) -> List:
    coeffs = [host.ext_sample(spec, rng) for _ in range(WITNESS_SIZE)]
    n_log = host.log2_strict(WITNESS_SIZE) + rate_bits
    padded = coeffs + [host.ext_zero(spec)] * ((1 << n_log) - WITNESS_SIZE)
    return _fft_host_ext(spec, padded, n_log)


def _degree(spec, values: List, n_log: int) -> int:
    coeffs = _ifft_host_ext(spec, values, n_log)
    zero = host.ext_zero(spec)
    for d in range(len(coeffs) - 1, -1, -1):
        if tuple(coeffs[d]) != tuple(zero):
            return d
    return 0


def test_low_degree(gate: Gate, spec=host.GOLDILOCKS, seed: int = 0):
    """reference gate_testing.rs:25-77."""
    rng = random.Random(seed)
    rate_bits = host.log2_ceil(gate.degree() + 1)
    n_log = host.log2_strict(WITNESS_SIZE) + rate_bits
    n = 1 << n_log
    A = HostExtAlgebra(spec)

    wire_ldes = [_random_low_degree_values(spec, rng, rate_bits)
                 for _ in range(gate.num_wires())]
    const_ldes = [_random_low_degree_values(spec, rng, rate_bits)
                  for _ in range(gate.num_constants())]
    pi_hash = [A.from_int(rng.randrange(spec.p))
               for _ in range(spec.num_hash_out_elts)]

    evals = []
    for i in range(n):
        vars = EvaluationVars([c[i] for c in const_ldes],
                              [w[i] for w in wire_ldes], pi_hash)
        evals.append(gate.eval_unfiltered(A, vars))
    assert all(len(e) == gate.num_constraints() for e in evals), \
        "eval should return num_constraints() constraints"

    expected = (WITNESS_SIZE - 1) * gate.degree()
    for j in range(gate.num_constraints()):
        d = _degree(spec, [evals[i][j] for i in range(n)], n_log)
        assert d <= expected, \
            f"constraint {j}: degree {d} > {expected}"


class _DictWitness:
    def __init__(self, vals):
        self.vals = dict(vals)

    def get_target(self, t):
        return self.vals[t]

    def contains(self, t):
        return t in self.vals

    def contains_all(self, ts):
        return all(t in self.vals for t in ts)


def check_generated_witness(gate: Gate, spec=host.GOLDILOCKS, seed: int = 0,
                            fixed: Optional[dict] = None,
                            constants: Optional[Sequence[int]] = None):
    """Run the gate's generators on random inputs; assert constraints vanish
    (native half of reference test_eval_fns, gate_testing.rs:102)."""
    from .base import HostBaseAlgebra

    rng = random.Random(seed)
    constants = list(constants or [rng.randrange(spec.p)
                                   for _ in range(gate.num_constants())])
    wires = {}
    if fixed:
        wires.update(fixed)
    gens = gate.generators(0, constants, spec)
    # seed dependencies with random values
    for g in gens:
        for t in g.dependencies():
            if t not in wires:
                wires[t] = rng.randrange(spec.p)
    w = _DictWitness(wires)
    produced = []
    for g in gens:
        out = []
        g.run_once(w, out)
        produced.extend(out)
        w.vals.update(dict(out))

    full = [0] * gate.num_wires()
    for (kind, row, col), v in {**wires, **dict(produced)}.items():
        full[col] = v

    A = HostBaseAlgebra(spec)
    pi_hash = [0] * spec.num_hash_out_elts
    vars = EvaluationVars([c % spec.p for c in constants], full, pi_hash)
    cs = gate.eval_unfiltered(A, vars)
    bad = [i for i, c in enumerate(cs) if c != 0]
    assert not bad, f"non-vanishing constraints: {bad[:8]}"
