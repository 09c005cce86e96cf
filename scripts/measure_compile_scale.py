"""Compile-scale measurement (VERDICT item 5): prove wall-time, compile
time and peak RSS vs circuit degree.

Builds a bench_recursion-style arithmetic-chain circuit at each requested
size, proves it twice (first = compile-inclusive, second = steady-state)
and reports one JSON line per size:
  {"degree_bits": N, "build_s": .., "prove1_s": .., "prove2_s": ..,
   "peak_rss_gb": ..}

Target from the round-1 verdict: a 2^16-domain prove compiles in <5 min and
<8 GB on a 1-CPU box (the round-1 prover hit 22.6 GB / >49 min on a ~2^7
fixture before the quotient evaluation was split into per-gate jitted
programs).

Usage: python scripts/measure_compile_scale.py [--sizes 12,14,16]
"""

import argparse
import json
import os
import resource
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def run_size(size: int):
    from plonky2_goldibear_tpu.iop.generator import seed_randomness
    from plonky2_goldibear_tpu.iop.witness import PartialWitness
    from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
    from plonky2_goldibear_tpu.plonk.config import CircuitConfig
    from plonky2_goldibear_tpu.plonk.verifier import verify

    seed_randomness(7)
    config = CircuitConfig.standard_recursion_config_gl()
    b = CircuitBuilder(config)
    x = b.add_virtual_target()
    cur = x
    # ~2^size ArithmeticGate rows (20 ops each): distinct constants defeat
    # the op cache so every op really lands in a slot
    n_ops = (1 << size) * 20 - 40
    p = b.spec.p
    for i in range(n_ops):
        cur = b.arithmetic(1 + (i % 97), 1 + (i % 89), cur, cur, cur)
    b.register_public_input(cur)

    t0 = time.time()
    data = b.build()
    build_s = time.time() - t0
    assert data.common.degree_bits >= size, data.common.degree_bits

    pw = PartialWitness()
    pw.set_target(x, 3)
    t0 = time.time()
    proof = data.prove(pw)
    prove1_s = time.time() - t0
    t0 = time.time()
    proof = data.prove(pw)
    prove2_s = time.time() - t0
    verify(proof, data.verifier_only, data.common)
    return {
        "degree_bits": data.common.degree_bits,
        "build_s": round(build_s, 1),
        "prove1_s_compile_inclusive": round(prove1_s, 1),
        "prove2_s_steady": round(prove2_s, 1),
        "peak_rss_gb": round(rss_gb(), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="12,14,16")
    args = ap.parse_args()
    for s in [int(x) for x in args.sizes.split(",")]:
        res = run_size(s)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
