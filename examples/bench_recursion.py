"""Recursion benchmark CLI (reference plonky2/examples/bench_recursion.rs):
build an inner circuit of ~2^size gates (optionally with lookups), prove it,
then wrap it in a recursive verification layer, reporting per-stage timings.

Usage:
  python examples/bench_recursion.py --size 12 --lookup-type 0 [--platform tpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=12,
                    help="log2 of inner circuit gate count")
    ap.add_argument("--lookup-type", type=int, default=0, choices=[0, 1, 2],
                    help="0: no lookups, 1: one LUT, 2: two LUTs")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (cpu | tpu via the axon tunnel)")
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    jax.config.update("jax_platforms",
                      "axon,cpu" if args.platform == "tpu"
                      else args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from plonky2_goldibear_tpu.iop.generator import seed_randomness
    from plonky2_goldibear_tpu.iop.witness import PartialWitness
    from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
    from plonky2_goldibear_tpu.plonk.config import CircuitConfig
    from plonky2_goldibear_tpu.plonk.verifier import verify
    from plonky2_goldibear_tpu.recursion import recursive_verifier as rv

    seed_randomness(args.seed)
    config = CircuitConfig.standard_recursion_config_gl()

    # inner circuit: a chain of arithmetic ops sized ~2^size gates
    # (reference bench_recursion.rs dummy_proof: size-many square ops)
    t0 = time.time()
    builder = CircuitBuilder(config)
    x = builder.add_virtual_target()
    builder.register_public_input(x)
    cur = x
    num_ops = (1 << args.size) * 20  # ~20 ops per ArithmeticGate row
    for _ in range(num_ops):
        cur = builder.arithmetic(1, 1, cur, cur, cur)  # cur = cur^2 + cur
    builder.register_public_input(cur)
    if args.lookup_type >= 1:
        from tests.test_lookups import TIP5_16
        lut = builder.add_lookup_table_from_table(list(range(16)), TIP5_16)
        out = builder.add_lookup_from_index(builder.constant(3), lut)
        builder.register_public_input(out)
    if args.lookup_type >= 2:
        lut2 = builder.add_lookup_table_from_fn(lambda v: v * 2 % 16,
                                                list(range(16)))
        out2 = builder.add_lookup_from_index(builder.constant(5), lut2)
        builder.register_public_input(out2)
    inner = builder.build()
    t_build = time.time() - t0
    print(f"inner build: degree=2^{inner.common.degree_bits} "
          f"({t_build:.2f}s)")

    t0 = time.time()
    pw = PartialWitness()
    pw.set_target(x, 3)
    inner_proof = inner.prove(pw)
    t_prove = time.time() - t0
    verify(inner_proof, inner.verifier_only, inner.common)
    print(f"inner prove: {t_prove:.2f}s (incl. first-compile)")

    t0 = time.time()
    pw2 = PartialWitness()
    pw2.set_target(x, 5)
    inner_proof2 = inner.prove(pw2)
    t_prove2 = time.time() - t0
    print(f"inner prove (warm): {t_prove2:.2f}s")

    t0 = time.time()
    outer = CircuitBuilder(config)
    proof_t = rv.add_virtual_proof_with_pis(outer, inner.common)
    vk_t = rv.add_virtual_verifier_data(
        outer, inner.common.config.fri_config.cap_height)
    rv.verify_proof(outer, proof_t, vk_t, inner.common)
    outer.register_public_inputs(proof_t.public_inputs)
    outer_data = outer.build()
    t_outer_build = time.time() - t0
    print(f"recursive circuit build: degree=2^"
          f"{outer_data.common.degree_bits} ({t_outer_build:.2f}s)")

    t0 = time.time()
    pw3 = PartialWitness()
    rv.set_proof_with_pis_target(pw3, proof_t, inner_proof2)
    rv.set_verifier_data_target(pw3, vk_t, inner.verifier_only)
    outer_proof = outer_data.prove(pw3)
    t_rec = time.time() - t0
    verify(outer_proof, outer_data.verifier_only, outer_data.common)
    print(f"recursive prove: {t_rec:.2f}s; all proofs verified")


if __name__ == "__main__":
    main()
