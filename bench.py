"""Benchmark driver: prints ONE JSON line with the headline metric.

Current headline (round 1): Poseidon-GL permutation throughput measured as a
full Merkle-cap commit of 2^13 leaves x 135 Goldilocks elements — the same
workload as the reference's merkle bench (plonky2/benches/merkle.rs:13-30)
and the wires-commit hot path of a 2^13-row circuit.

vs_baseline: the reference publishes no numbers (BASELINE.md); we compare
against an estimated 64-core CPU figure of 1.0e8 Poseidon permutations/s
(~1.56M perms/s/core scalar Rust), documented here so the assumption is
auditable.  Later rounds switch this to proofs/s on the recursion bench.
"""

import json
import time

import numpy as np


def main():
    import jax
    from plonky2_goldibear_tpu.field import gl
    from plonky2_goldibear_tpu.hash import merkle

    n_leaves = 1 << 13
    leaf_len = 135
    cap_height = 4
    rng = np.random.default_rng(0)
    vals = rng.integers(0, gl.P, size=(n_leaves, leaf_len), dtype=np.uint64)
    leaves = gl.from_ints(vals)
    num_layers = 13 - cap_height

    @jax.jit
    def build(lo, hi):
        levels = merkle.build_levels(gl.GL(lo, hi), num_layers)
        cap = levels[-1]
        return cap.lo, cap.hi

    # permutations per build: leaf sponge (ceil(135/8)=17 permutes each)
    # + one two_to_one permute per internal node below the cap
    perms_per_leaf = -(-leaf_len // 8)
    internal = n_leaves - (1 << cap_height)
    total_perms = n_leaves * perms_per_leaf + internal

    lo, hi = build(leaves.lo, leaves.hi)
    jax.block_until_ready((lo, hi))
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        lo, hi = build(leaves.lo, leaves.hi)
    jax.block_until_ready((lo, hi))
    dt = (time.perf_counter() - t0) / iters

    perms_per_s = total_perms / dt
    baseline_cpu = 1.0e8  # estimated 64-core scalar-Rust Poseidon perms/s
    print(json.dumps({
        "metric": "poseidon_gl_perms_per_s",
        "value": round(perms_per_s, 1),
        "unit": "perms/s",
        "vs_baseline": round(perms_per_s / baseline_cpu, 3),
    }))


if __name__ == "__main__":
    main()
