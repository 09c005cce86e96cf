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


def _build_arith_chain(config, spec=None, target_degree_bits=12):
    """An ArithmeticGate chain sized to land at degree 2^target_degree_bits
    (a handful of rows go to the PI gate / constants / padding)."""
    from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder

    kwargs = {"spec": spec} if spec is not None else {}
    builder = CircuitBuilder(config, **kwargs)
    x = builder.add_virtual_target()
    builder.register_public_input(x)
    cur = x
    ops_per_gate = config.num_routed_wires // 4
    for _ in (range(((1 << target_degree_bits) - 8) * ops_per_gate)):
        cur = builder.arithmetic(1, 1, cur, cur, cur)
    builder.register_public_input(cur)
    data = builder.build()
    assert data.common.degree_bits == target_degree_bits, \
        data.common.degree_bits
    return data, x


def _warm_proofs_per_s(data, x, n_iters=3):
    """Min wall-clock over warm proves -> proofs/s (compile cache hot)."""
    import time as _t

    from plonky2_goldibear_tpu.iop.witness import PartialWitness
    from plonky2_goldibear_tpu.plonk.verifier import verify

    def one_prove(seed):
        pw = PartialWitness()
        pw.set_target(x, 3 + seed)
        return data.prove(pw)

    proof = one_prove(0)              # compile + warm
    verify(proof, data.verifier_only, data.common)
    times = []
    for i in range(n_iters):
        t0 = _t.perf_counter()
        one_prove(i + 1)
        times.append(_t.perf_counter() - t0)
    return 1.0 / min(times)


def bench_prove_inner():
    """Prove a 2^12-row GL circuit (the reference bench_recursion inner
    stage, plonky2/examples/bench_recursion.rs:53-84): warm proofs/s plus
    one phase-attributed (sync-transcript) run."""
    import time as _t

    from plonky2_goldibear_tpu.iop.generator import seed_randomness
    from plonky2_goldibear_tpu.iop.witness import PartialWitness
    from plonky2_goldibear_tpu.plonk.config import CircuitConfig
    from plonky2_goldibear_tpu.utils.timing import ProvingProcessInfo

    seed_randomness(42)
    data, x = _build_arith_chain(
        CircuitConfig.standard_recursion_config_gl())
    pps = _warm_proofs_per_s(data, x)
    # phase attribution runs the SYNC transcript path (timing mode), so the
    # per-phase sum exceeds the async headline wall-clock
    timing = ProvingProcessInfo("prove")
    pw = PartialWitness()
    pw.set_target(x, 99)
    t0 = _t.perf_counter()
    data.prove(pw, timing=timing)
    sync_s = _t.perf_counter() - t0
    timing.close()
    phases = {c.name: round(c.exit_time - c.enter_time, 4)
              for c in timing.children}
    phases["total_sync_path"] = round(sync_s, 4)
    return pps, data.common.degree_bits, phases, data, x


def bench_prove_recursive(inner_data, inner_x):
    """THE reference headline (plonky2/benches/recursion.rs:154-202): prove
    the recursive-verifier circuit wrapping a 2^12 inner proof."""
    from plonky2_goldibear_tpu.iop.witness import PartialWitness
    from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
    from plonky2_goldibear_tpu.plonk.verifier import verify
    from plonky2_goldibear_tpu.recursion import recursive_verifier as rv

    pw = PartialWitness()
    pw.set_target(inner_x, 3)
    inner_proof = inner_data.prove(pw)

    outer = CircuitBuilder(inner_data.common.config)
    proof_t = rv.add_virtual_proof_with_pis(outer, inner_data.common)
    vk_t = rv.add_virtual_verifier_data(
        outer, inner_data.common.config.fri_config.cap_height)
    rv.verify_proof(outer, proof_t, vk_t, inner_data.common)
    outer.register_public_inputs(proof_t.public_inputs)
    outer_data = outer.build()

    import time as _t

    from plonky2_goldibear_tpu.plonk.verifier import verify as _verify

    def one_prove():
        pw3 = PartialWitness()
        rv.set_proof_with_pis_target(pw3, proof_t, inner_proof)
        rv.set_verifier_data_target(pw3, vk_t, inner_data.verifier_only)
        return outer_data.prove(pw3)

    proof = one_prove()
    _verify(proof, outer_data.verifier_only, outer_data.common)
    times = []
    for _ in range(3):
        t0 = _t.perf_counter()
        one_prove()
        times.append(_t.perf_counter() - t0)
    return 1.0 / min(times), outer_data.common.degree_bits


def bench_prove_bb():
    """BabyBear proofs/s (the fork's field-generic headline,
    reference README.md:1-8): a 2^12-row BB-narrow circuit with
    Poseidon2-BB transcript."""
    from plonky2_goldibear_tpu.field import host
    from plonky2_goldibear_tpu.plonk.config import CircuitConfig

    data, x = _build_arith_chain(
        CircuitConfig.standard_recursion_config_bb(), spec=host.BABYBEAR)
    pps = _warm_proofs_per_s(data, x)
    return pps, data.common.degree_bits


def _run_stage(extra, key, deadline, min_budget, fn, *args):
    """Run one bench stage under the global deadline; record errors instead
    of swallowing them.  Returns the stage result or None."""
    import signal
    import time as _t
    import traceback

    remaining = int(deadline - _t.time())
    if remaining < min_budget:
        extra[key + "_skipped"] = f"budget ({remaining}s left)"
        return None
    try:
        signal.signal(signal.SIGALRM,
                      lambda *_: (_ for _ in ()).throw(TimeoutError()))
        signal.alarm(remaining)
        return fn(*args)
    except BaseException as e:
        extra[key + "_error"] = "".join(
            traceback.format_exception_only(type(e), e)).strip()[:300]
        return None
    finally:
        signal.alarm(0)


def main():
    import time as _t

    import jax
    # persistent compile cache: repeated bench runs (and the prove stage's
    # many phase programs) reuse executables across processes
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    backend = jax.default_backend()
    # hard budget: fresh-circuit compiles on a cold cache can take many
    # minutes; never let one stage starve the others
    deadline = _t.time() + 2400
    perms_per_s = bench_poseidon_merkle()
    ntt_elems_per_s = bench_ntt_2e24()
    # The reference publishes no numbers and no cargo toolchain exists on
    # this box (BASELINE.md), so the comparison points are documented
    # estimates of a 64-core scalar-Rust CPU — flagged as such in the JSON.
    baseline_perms = 1.0e8   # estimated 64-core scalar-Rust Poseidon perms/s
    baseline_ntt = 2.0e8     # estimated 64-core 2^24 NTT elems/s
    baseline_proofs = 2.0    # estimated 64-core proofs/s, 2^12-row circuit
    # (both the flat inner circuit and the recursive-verifier circuit land
    # at ~2^12 rows; one documented estimate serves both)
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

    inner = _run_stage(extra, "prove", deadline, 120, bench_prove_inner)
    rec_pps = rec_bits = None
    if inner is not None:
        inner_pps, inner_bits, phases, inner_data, inner_x = inner
        extra["inner_proofs_per_s_2e%d" % inner_bits] = round(inner_pps, 4)
        extra["inner_vs_baseline"] = round(inner_pps / baseline_proofs, 3)
        extra["prove_phase_s"] = phases
        rec = _run_stage(extra, "recursive", deadline, 300,
                         bench_prove_recursive, inner_data, inner_x)
        if rec is not None:
            rec_pps, rec_bits = rec
    bb = _run_stage(extra, "bb_prove", deadline, 180, bench_prove_bb)
    if bb is not None:
        extra["bb_proofs_per_s_2e%d" % bb[1]] = round(bb[0], 4)
        extra["bb_vs_baseline"] = round(bb[0] / baseline_proofs, 3)

    if rec_pps is not None:
        # HEADLINE: proving the recursive-verifier circuit — the
        # reference's own benchmark (plonky2/benches/recursion.rs:154-202)
        print(json.dumps({
            "metric": "recursive_proofs_per_s_2e%d" % rec_bits,
            "value": round(rec_pps, 4),
            "unit": "proofs/s",
            "vs_baseline": round(rec_pps / baseline_proofs, 3),
            "extra": extra,
        }))
    elif inner is not None:
        print(json.dumps({
            "metric": "proofs_per_s_2e%d" % inner_bits,
            "value": round(inner_pps, 4),
            "unit": "proofs/s",
            "vs_baseline": round(inner_pps / baseline_proofs, 3),
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
