"""On-chip large-domain end-to-end prove (VERDICT r4 #3): build a circuit
at degree 2^SIZE_LOG (default 20) with the streaming constants commitment,
prove it with the streaming-oracle prover (plonk/prover_large.py), verify,
and commit the timings as scripts/large_prove_r5.json.

At degree 2^20 / rate 8 the dense oracle set needs ~25 GB HBM (VERDICT r4
§5.7) — far beyond one v5e chip; the streaming prover never materializes
an LDE or leaf matrix.  The circuit uses a bounded count of real
ArithmeticGate rows plus NoopGate padding so host-side circuit
construction stays minutes, not hours (the Python builder emits ~15k
ops/s on this 1-core box; gate count, not gate type, sets the proving
domain).

Usage: python scripts/large_prove_onchip.py   [SIZE_LOG=20] [cpu]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from plonky2_goldibear_tpu.gates.basic_gates import NoopGate
    from plonky2_goldibear_tpu.iop.generator import seed_randomness
    from plonky2_goldibear_tpu.iop.witness import PartialWitness
    from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
    from plonky2_goldibear_tpu.plonk.config import CircuitConfig
    from plonky2_goldibear_tpu.plonk.prover_large import prove_large
    from plonky2_goldibear_tpu.plonk.verifier import verify

    size_log = int(os.environ.get("SIZE_LOG", "20"))
    real_rows = min(1 << 13, 1 << (size_log - 1))
    results = {"size_log": size_log, "backend": jax.default_backend(),
               "device_kind": jax.devices()[0].device_kind,
               "real_arith_rows": real_rows}
    print("backend:", jax.default_backend(), "size_log:", size_log,
          flush=True)

    seed_randomness(5)
    t0 = time.time()
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config_gl())
    x = builder.add_virtual_target()
    cur = x
    ops = real_rows * 20
    for _ in range(ops):
        cur = builder.arithmetic(1, 1, cur, cur, cur)
    while len(builder.gate_instances) < (1 << size_log) - 1:
        builder.add_gate(NoopGate(), [])
    t1 = time.time()
    results["emit_s"] = round(t1 - t0, 1)
    print("emit:", results["emit_s"], "s", flush=True)
    data = builder.build(commit_streaming=True)
    t2 = time.time()
    results["build_s"] = round(t2 - t1, 1)
    results["degree_bits"] = data.common.degree_bits
    results["lde_points"] = data.common.degree << \
        data.common.config.fri_config.rate_bits
    print("build:", results["build_s"], "s, degree_bits:",
          data.common.degree_bits, flush=True)
    assert data.common.degree_bits == size_log, data.common.degree_bits

    pw = PartialWitness()
    pw.set_target(x, 3)
    t3 = time.time()
    proof = prove_large(data.prover_only, data.common, pw)
    t4 = time.time()
    results["prove_s_cold"] = round(t4 - t3, 1)
    print("prove (cold):", results["prove_s_cold"], "s", flush=True)
    verify(proof, data.verifier_only, data.common)
    results["verify"] = "OK"
    print("VERIFY OK", flush=True)

    # warm prove: steady-state number with compiles cached
    pw2 = PartialWitness()
    pw2.set_target(x, 4)
    t5 = time.time()
    prove_large(data.prover_only, data.common, pw2)
    results["prove_s_warm"] = round(time.time() - t5, 1)
    print("prove (warm):", results["prove_s_warm"], "s", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "large_prove_r5.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
