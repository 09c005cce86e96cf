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

Hardware-fit note (measured on the v5e behind the tunnel, round 3): the
Poseidon sbox chain sustains 4.44e9 x^7 evaluations/s on the VPU (the x^7
over u32 limb pairs is ~380 vector ops; the MXU cannot help an elementwise
modular power), which bounds this permutation at ~45M perms/s/chip — the
kernel runs at ~78% of that bound, so perms-vs-64-core-CPU parity is not
reachable on ONE v5e chip for this VPU-bound metric; it scales linearly
with chips (data-parallel leaves — ``poseidon_chips_to_parity`` in the
JSON makes the scaling explicit) and with the VPU width/clock of bigger
parts (v5p).  The NTT, by contrast, is MXU/VPU-friendly and beats the
CPU baseline per chip (see ntt_2e24_elems_per_s).

Sbox op-count reduction attempts (round 4, negative result): a 3-mult
Karatsuba split of the 64x64 limb product saves one 16-bit-split 32x32
product (~21 vector ops) but pays ~24 ops of 33-bit middle-sum carry
handling (the a0+a1 / b0+b1 sums overflow a lane, and z1 - z0 - z2 is a
2-limb borrow chain), netting ~ +3 ops of the ~114-op lazy multiply — so
the schoolbook limb schedule stands.  Squaring already uses the dedicated
3-product ``_sqr`` chain.  The remaining lever on this metric is chips,
not ops.
"""

import json
import time

import numpy as np


def _time_dispatch(fn, args, k):
    """Seconds for one dispatch of fn(*args, k) incl. a real output fetch."""
    t0 = time.perf_counter()
    out = fn(*args, np.int32(k))
    for leaf in out if isinstance(out, (tuple, list)) else [out]:
        np.asarray(leaf)
    return time.perf_counter() - t0


def _marginal(fn, args, k):
    """Per-iteration device time via chained on-device iterations.

    fn(*args, j) must run j data-dependent iterations in ONE program.
    Warm both program shapes first (k and 2k are distinct static args ->
    distinct executables), then take the k-vs-2k marginal.  The chip behind
    the tunnel is time-shared, so single measurements can be off by several
    x in either direction: take min-of-3 for each dispatch time (min is the
    contention-free estimate) and require the marginal to be positive.
    """
    _time_dispatch(fn, args, k)       # compile + warm (k is dynamic: the
    _time_dispatch(fn, args, 2 * k)   # same executable serves k and 2k)
    t1 = min(_time_dispatch(fn, args, k) for _ in range(3))
    t2 = min(_time_dispatch(fn, args, 2 * k) for _ in range(3))
    if t2 <= t1:                      # contention artifact; fall back to
        return t2 / (2 * k)           # amortized full-dispatch time
    return (t2 - t1) / k


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

    @jax.jit
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
    dt = _marginal(build_k, (leaves.lo, leaves.hi), k=32)
    return total_perms / dt


def bench_ntt_2e24():
    import functools

    import jax
    from plonky2_goldibear_tpu.field import gl, fft as fftm

    n = 1 << 24
    rng = np.random.default_rng(1)
    x = gl.from_ints(rng.integers(0, gl.P, size=(1, n), dtype=np.uint64))

    @jax.jit
    def ntt_k(lo, hi, k):
        def step(_, carry):
            out = fftm.fft(gl, gl.GL(*carry))
            return (out.lo, out.hi)

        lo, hi = jax.lax.fori_loop(0, k, step, (lo, hi))
        # fetch only a slice: the full 134 MB output would make every timing
        # a tunnel-bandwidth measurement whenever the k-vs-2k marginal falls
        # back to amortized dispatch time under chip contention
        return lo[..., :128], hi[..., :128]

    dt = _marginal(ntt_k, (x.lo, x.hi), k=4)
    return n / dt


def bench_prove_2e12():
    """Full on-TPU prove of a 2^12-row GL circuit: wall-clock proofs/s after
    warmup (compile cache hot, same witness shapes).  The analog of the
    reference's bench_recursion inner-proof stage
    (plonky2/benches/../examples/bench_recursion.rs)."""
    import time as _t

    from plonky2_goldibear_tpu.iop.generator import seed_randomness
    from plonky2_goldibear_tpu.iop.witness import PartialWitness
    from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
    from plonky2_goldibear_tpu.plonk.config import CircuitConfig
    from plonky2_goldibear_tpu.plonk.verifier import verify

    seed_randomness(42)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config_gl())
    x = builder.add_virtual_target()
    builder.register_public_input(x)
    cur = x
    for _ in range((1 << 12) * 20):   # ~20 ops per ArithmeticGate row
        cur = builder.arithmetic(1, 1, cur, cur, cur)
    builder.register_public_input(cur)
    data = builder.build()

    from plonky2_goldibear_tpu.utils.timing import ProvingProcessInfo

    def one_prove(seed, timing=None):
        pw = PartialWitness()
        pw.set_target(x, 3 + seed)
        return data.prove(pw, timing=timing)

    proof = one_prove(0)              # compile + warm
    verify(proof, data.verifier_only, data.common)
    times = []
    phases = None
    for i in range(3):
        timing = ProvingProcessInfo("prove")
        t0 = _t.perf_counter()
        one_prove(i + 1, timing)
        dt = _t.perf_counter() - t0
        if not times or dt < min(times):
            timing.close()
            phases = {c.name: round(c.exit_time - c.enter_time, 4)
                      for c in timing.children}
        times.append(dt)
    return 1.0 / min(times), data.common.degree_bits, phases


def main():
    import signal
    import traceback

    import jax
    # persistent compile cache: repeated bench runs (and the prove stage's
    # many phase programs) reuse executables across processes
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    backend = jax.default_backend()
    perms_per_s = bench_poseidon_merkle()
    ntt_elems_per_s = bench_ntt_2e24()
    prove_error = None
    try:
        # hard budget: a fresh-circuit compile on a cold cache can take many
        # minutes; never let the prove stage starve the headline metrics
        signal.signal(signal.SIGALRM,
                      lambda *_: (_ for _ in ()).throw(TimeoutError()))
        signal.alarm(1500)
        proofs_per_s, prove_bits, prove_phases = bench_prove_2e12()
    except BaseException as e:  # keep the other metrics alive if the prove
        proofs_per_s, prove_bits = None, None   # path breaks on the tunnel,
        prove_phases = None
        prove_error = "".join(                  # but NEVER hide the failure
            traceback.format_exception_only(type(e), e)).strip()[:500]
    finally:
        signal.alarm(0)
    # The reference publishes no numbers and no cargo toolchain exists on
    # this box (BASELINE.md), so the comparison points are documented
    # estimates of a 64-core scalar-Rust CPU — flagged as such in the JSON.
    baseline_perms = 1.0e8   # estimated 64-core scalar-Rust Poseidon perms/s
    baseline_ntt = 2.0e8     # estimated 64-core 2^24 NTT elems/s
    baseline_proofs = 2.0    # estimated 64-core proofs/s at 2^12 rows
    # measured v5e VPU roofline: 4.44e9 x^7/s -> ~45M perms/s/chip ceiling
    # (see module docstring); chips_to_parity = chips of THIS kernel needed
    # to match the 64-core-CPU estimate (leaves are data-parallel)
    extra = {
        "poseidon_gl_perms_per_s": round(perms_per_s, 1),
        "poseidon_vs_baseline": round(perms_per_s / baseline_perms, 3),
        "poseidon_chips_to_parity": round(baseline_perms / perms_per_s, 2),
        "ntt_2e24_elems_per_s": round(ntt_elems_per_s, 1),
        "ntt_vs_baseline": round(ntt_elems_per_s / baseline_ntt, 3),
        "baseline_source": "estimate (reference publishes none; no cargo "
                           "toolchain on this box — BASELINE.md)",
        "backend": backend,
        "device_kind": jax.devices()[0].device_kind,
    }
    if prove_error is not None:
        extra["prove_error"] = prove_error
    if prove_phases:
        extra["prove_phase_s"] = prove_phases
    if proofs_per_s is not None:
        # headline: per-proof throughput, the reference's own north star
        # (plonky2/benches/recursion.rs:154-202; BASELINE.md)
        print(json.dumps({
            "metric": "proofs_per_s_2e%d" % prove_bits,
            "value": round(proofs_per_s, 4),
            "unit": "proofs/s",
            "vs_baseline": round(proofs_per_s / baseline_proofs, 3),
            "extra": extra,
        }))
    else:
        print(json.dumps({
            "metric": "poseidon_gl_perms_per_s",
            "value": round(perms_per_s, 1),
            "unit": "perms/s",
            "vs_baseline": round(perms_per_s / baseline_perms, 3),
            "extra": extra,
        }))


if __name__ == "__main__":
    main()
