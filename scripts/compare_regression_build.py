"""Producer-direction bit-exactness experiment: rebuild the reference's GL
recursive-verifier regression circuit with OUR builder and byte-compare the
serialized CommonCircuitData / VerifierOnlyCircuitData against the committed
reference artifacts (tests/data/gl_regression_*.bin).

Recipe mirrored from the reference tests
(plonky2/src/recursion/recursive_verifier.rs:253-274, 666-697, 895-955):
  inner = dummy_proof(standard_recursion_zk_config_gl, 4000):
      4000 NoopGates, PoseidonGate added to the gate set, 4 zero PIs
  outer = recursive_proof(inner, config, min_degree_bits=None):
      add_virtual_proof_with_pis + add_virtual_verifier_data + verify_proof
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_goldibear_tpu.gates.basic_gates import NoopGate  # noqa: E402
from plonky2_goldibear_tpu.gates.poseidon import PoseidonGate  # noqa: E402
from plonky2_goldibear_tpu.plonk import serialization as ser  # noqa: E402
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder  # noqa: E402
from plonky2_goldibear_tpu.plonk.config import CircuitConfig  # noqa: E402
from plonky2_goldibear_tpu.recursion import recursive_verifier as rv  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_inner(config):
    b = CircuitBuilder(config)
    for _ in range(4000):
        b.add_gate(NoopGate(), [])
    b.add_gate_to_gate_set(PoseidonGate())
    z = b.zero()
    for _ in range(b.spec.num_hash_out_elts):
        b.register_public_input(z)
    return b.build()


def build_outer(inner, config):
    b = CircuitBuilder(config)
    pt = rv.add_virtual_proof_with_pis(b, inner.common)
    vk_t = rv.add_virtual_verifier_data(b, config.fri_config.cap_height)
    rv.verify_proof(b, pt, vk_t, inner.common)
    return b.build()


def first_diff(a: bytes, b: bytes):
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return None if len(a) == len(b) else n


def report(name, ours: bytes, ref: bytes):
    print(f"--- {name}: ours={len(ours)}B ref={len(ref)}B", flush=True)
    d = first_diff(ours, ref)
    if d is None:
        print(f"    IDENTICAL ({len(ours)} bytes)")
        return True
    print(f"    first diff at byte {d}")
    print(f"    ours[{d}:{d+32}] = {ours[d:d+32].hex()}")
    print(f"    ref [{d}:{d+32}] = {ref[d:d+32].hex()}")
    return False


def describe_common(tag, c):
    print(f"[{tag}] degree_bits={c.degree_bits} gates={len(c.gates)} "
          f"num_gate_constraints={c.num_gate_constraints} "
          f"num_constants={c.num_constants} num_pi={c.num_public_inputs} "
          f"num_partial_products={c.num_partial_products} "
          f"quotient_degree_factor={c.quotient_degree_factor}")
    for g in c.gates:
        print(f"    gate: {g.id()}")
    si = c.selectors_info
    print(f"    selector groups: {si.groups if hasattr(si, 'groups') else si}")


def main():
    config = CircuitConfig.standard_recursion_zk_config_gl()
    print("building inner (4000 noops, zk config)...", flush=True)
    inner = build_inner(config)
    describe_common("inner", inner.common)

    print("building outer (recursive verifier)...", flush=True)
    outer = build_outer(inner, config)
    describe_common("outer", outer.common)

    ref_common = open(os.path.join(
        HERE, "tests/data/gl_regression_common.bin"), "rb").read()
    ref_vk = open(os.path.join(
        HERE, "tests/data/gl_regression_verifier.bin"), "rb").read()
    ref_c = ser.read_common_circuit_data(ref_common)
    describe_common("reference-outer", ref_c)

    ours_common = ser.write_common_circuit_data(outer.common)
    ok1 = report("CommonCircuitData", ours_common, ref_common)
    ours_vk = ser.write_verifier_only_circuit_data(outer.verifier_only)
    ok2 = report("VerifierOnlyCircuitData", ours_vk, ref_vk)
    print("RESULT:", "MATCH" if (ok1 and ok2) else "MISMATCH")


if __name__ == "__main__":
    main()
