"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: Poseidon-GL permutation throughput measured as a full Merkle-cap
commit of 2^13 leaves x 135 Goldilocks elements — the same workload as the
reference's merkle bench (plonky2/benches/merkle.rs:13-30) and the
wires-commit hot path of a 2^13-row circuit.  Secondary metrics ride in the
same JSON object under "extra":
  - ntt_2e24_elems_per_s: single-poly 2^24-point NTT (ops/ntt.py four-step);
    the reference bench analog is `ffts`/`lde` (plonky2/benches/ffts.rs)

Measurement discipline: the TPU sits behind a network tunnel where host-side
iteration loops measure RPC latency, not device work (block_until_ready can
return early; repeated identical dispatches get elided; marginal host timing
even goes negative).  Every metric therefore chains k iterations INSIDE one
jitted program via lax.fori_loop with a data dependency between iterations,
and times one dispatch+fetch for k and 2k: marginal = (t_2k - t_k) / k is
pure device throughput, with compile/transfer/RPC fixed costs cancelled.

vs_baseline: the reference publishes no numbers (BASELINE.md); we compare
against an estimated 64-core CPU figure of 1.0e8 Poseidon permutations/s
(~1.56M perms/s/core scalar Rust), documented here so the assumption is
auditable.  The NTT baseline estimate is 2.0e8 elems/s for a 64-core CPU
2^24 NTT (~85 ms; scalar Rust radix-2 with rayon column parallelism).
"""

import json
import time

import numpy as np


def _time_dispatch(fn, args, k):
    """Seconds for one dispatch of fn(*args, k) incl. a real output fetch."""
    t0 = time.perf_counter()
    out = fn(*args, k)
    for leaf in out if isinstance(out, (tuple, list)) else [out]:
        np.asarray(leaf)
    return time.perf_counter() - t0


def _marginal(fn, args, k):
    """Per-iteration device time via chained on-device iterations.

    fn(*args, j) must run j data-dependent iterations in ONE program.
    Warm both program shapes first (k and 2k are distinct static args ->
    distinct executables), then take the k-vs-2k marginal, best of 2.
    """
    _time_dispatch(fn, args, k)       # compile + warm
    _time_dispatch(fn, args, 2 * k)
    best = float("inf")
    for _ in range(2):
        t1 = _time_dispatch(fn, args, k)
        t2 = _time_dispatch(fn, args, 2 * k)
        best = min(best, (t2 - t1) / k)
    return best


def bench_poseidon_merkle():
    import functools

    import jax
    import jax.numpy as jnp
    from plonky2_goldibear_tpu.field import gl
    from plonky2_goldibear_tpu.hash import merkle

    n_leaves = 1 << 13
    leaf_len = 135
    cap_height = 4
    rng = np.random.default_rng(0)
    leaves = gl.from_ints(rng.integers(0, gl.P, size=(n_leaves, leaf_len),
                                       dtype=np.uint64))
    num_layers = 13 - cap_height

    @functools.partial(jax.jit, static_argnums=(2,))
    def build_k(lo, hi, k):
        def step(_, carry):
            clo, chi = carry
            levels = merkle.build_levels(gl.GL(clo, chi), num_layers)
            cap = levels[-1]
            # data dependency: fold one cap word back into the leaves (low
            # bit only — keeps values < p, cost is one broadcast XOR)
            clo = clo ^ (cap.lo[0, 0] & 1)
            return (clo, chi)

        lo, hi = jax.lax.fori_loop(0, k, step, (lo, hi))
        levels = merkle.build_levels(gl.GL(lo, hi), num_layers)
        cap = levels[-1]
        return cap.lo, cap.hi

    perms_per_leaf = -(-leaf_len // 8)
    internal = n_leaves - (1 << cap_height)
    total_perms = n_leaves * perms_per_leaf + internal
    dt = _marginal(build_k, (leaves.lo, leaves.hi), k=8)
    return total_perms / dt


def bench_ntt_2e24():
    import functools

    import jax
    from plonky2_goldibear_tpu.field import gl, fft as fftm

    n = 1 << 24
    rng = np.random.default_rng(1)
    x = gl.from_ints(rng.integers(0, gl.P, size=(1, n), dtype=np.uint64))

    @functools.partial(jax.jit, static_argnums=(2,))
    def ntt_k(lo, hi, k):
        def step(_, carry):
            out = fftm.fft(gl, gl.GL(*carry))
            return (out.lo, out.hi)

        lo, hi = jax.lax.fori_loop(0, k, step, (lo, hi))
        return lo, hi

    dt = _marginal(ntt_k, (x.lo, x.hi), k=2)
    return n / dt


def main():
    import jax
    backend = jax.default_backend()
    perms_per_s = bench_poseidon_merkle()
    ntt_elems_per_s = bench_ntt_2e24()
    baseline_perms = 1.0e8   # estimated 64-core scalar-Rust Poseidon perms/s
    baseline_ntt = 2.0e8     # estimated 64-core 2^24 NTT elems/s
    print(json.dumps({
        "metric": "poseidon_gl_perms_per_s",
        "value": round(perms_per_s, 1),
        "unit": "perms/s",
        "vs_baseline": round(perms_per_s / baseline_perms, 3),
        "extra": {
            "ntt_2e24_elems_per_s": round(ntt_elems_per_s, 1),
            "ntt_vs_baseline": round(ntt_elems_per_s / baseline_ntt, 3),
            "backend": backend,
        },
    }))


if __name__ == "__main__":
    main()
