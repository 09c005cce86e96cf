"""Minimal on-TPU prove+verify repro at SIZE_LOG (default 9).

Finds the smallest circuit size where the TPU-produced proof fails the
verifier (CPU-produced proofs for the same circuit pass the whole suite).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_goldibear_tpu.iop.generator import seed_randomness
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.plonk.verifier import verify

SIZE_LOG = int(os.environ.get("SIZE_LOG", "9"))


def main():
    t0 = time.time()
    print("backend:", jax.default_backend(), "size_log:", SIZE_LOG,
          flush=True)
    seed_randomness(42)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config_gl())
    x = builder.add_virtual_target()
    builder.register_public_input(x)
    cur = x
    for _ in range((1 << SIZE_LOG) * 20):
        cur = builder.arithmetic(1, 1, cur, cur, cur)
    builder.register_public_input(cur)
    data = builder.build()
    print("build s:", round(time.time() - t0, 1),
          "degree_bits:", data.common.degree_bits, flush=True)
    pw = PartialWitness()
    pw.set_target(x, 3)
    t1 = time.time()
    proof = data.prove(pw)
    print("prove s:", round(time.time() - t1, 1), flush=True)
    try:
        verify(proof, data.verifier_only, data.common)
        print("VERIFY OK", flush=True)
    except Exception as e:
        print("VERIFY FAIL:", type(e).__name__, str(e)[:500], flush=True)


if __name__ == "__main__":
    main()
