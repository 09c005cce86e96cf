"""Digest-identity diagnostic for the producer direction.

The reference regression proof's 28 FRI query rounds open the
constants_sigmas oracle (all preprocessed polynomials) at 28
transcript-derived LDE points.  After rebuilding the regression circuit with
OUR builder (common data already byte-identical), compare our
constants_sigmas LDE at those points against the openings in the reference
proof.  A mismatch localizes per-POLYNOMIAL:

  poly layout (reference plonk/circuit_data.rs ConstantsSigmas commit):
    [ selector polys | constant polys | sigma polys (num_routed_wires) ]

- selector poly k differs  -> gate-type placement differs on some rows
- constant poly k differs  -> constant assignment order differs
- sigma poly j differs     -> copy-constraint routing of wire j differs
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from plonky2_goldibear_tpu.field import host  # noqa: E402
from plonky2_goldibear_tpu.hash import poseidon_gl  # noqa: E402
from plonky2_goldibear_tpu.plonk import serialization as ser  # noqa: E402
from plonky2_goldibear_tpu.plonk.get_challenges import get_challenges  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    common = ser.read_common_circuit_data(
        open(os.path.join(HERE, "tests/data/gl_regression_common.bin"),
             "rb").read())
    vk = ser.read_verifier_only_circuit_data(
        open(os.path.join(HERE, "tests/data/gl_regression_verifier.bin"),
             "rb").read())
    proof_wp = ser.read_proof_with_public_inputs(
        open(os.path.join(HERE, "tests/data/gl_regression_proof.bin"),
             "rb").read(), common)

    pi_hash = poseidon_gl.hash_no_pad_host(proof_wp.public_inputs)
    challenges = get_challenges(proof_wp, pi_hash, vk.circuit_digest, common,
                                poseidon_gl)
    q_indices = challenges["fri_query_indices"]
    lde_bits = common.degree_bits + common.config.fri_config.rate_bits
    print(f"lde_bits={lde_bits} queries={q_indices}")

    # reference leaf values for the constants_sigmas oracle (oracle 0)
    ref_leaves = []
    for rnd in proof_wp.proof.opening_proof.query_round_proofs:
        leaf, _sib = rnd.initial_trees_proof.evals_proofs[0]
        ref_leaves.append([int(v) for v in leaf])
    n_pre = len(ref_leaves[0])
    print(f"preprocessed polys: {n_pre}")

    # rebuild the circuit (same recipe as compare_regression_build)
    sys.path.insert(0, os.path.join(HERE, "scripts"))
    from compare_regression_build import build_inner, build_outer
    from plonky2_goldibear_tpu.plonk.config import CircuitConfig

    config = CircuitConfig.standard_recursion_zk_config_gl()
    print("building inner...", flush=True)
    inner = build_inner(config)
    print("building outer...", flush=True)
    outer = build_outer(inner, config)
    ours_common = ser.write_common_circuit_data(outer.common)
    ref_common = open(os.path.join(
        HERE, "tests/data/gl_regression_common.bin"), "rb").read()
    print("CommonCircuitData bytes:",
          "IDENTICAL" if ours_common == ref_common else "DIFFER", flush=True)

    commit = outer.prover_only.constants_sigmas_commitment
    lde = commit.lde_host()      # (num_polys, lde_size) natural point order
    assert lde.shape[0] == n_pre, (lde.shape, n_pre)

    # leaf index x -> natural LDE point rev(x) (leaves are committed in
    # bit-reversed point order; subgroup_x = shift * g^rev(x))
    nc = common.num_constants
    nr = common.config.num_routed_wires
    print(f"layout: selectors+constants={nc} sigmas={nr}")

    bad_polys = {}
    for qi, x_index in enumerate(q_indices):
        nat = host.reverse_bits(x_index, lde_bits)
        ours = lde[:, nat]
        for p_idx in range(n_pre):
            if int(ours[p_idx]) != ref_leaves[qi][p_idx]:
                bad_polys.setdefault(p_idx, []).append(qi)

    # compact range summary FIRST (long listings get truncated by pollers)
    bad = sorted(bad_polys)
    ranges = []
    for p in bad:
        if ranges and p == ranges[-1][1] + 1:
            ranges[-1][1] = p
        else:
            ranges.append([p, p])
    print(f"SUMMARY diverging {len(bad)}/{n_pre} polys "
          f"(layout: 0..{nc - 1} selector/constant, "
          f"{nc}..{n_pre - 1} = sigma[0..{n_pre - 1 - nc}])")
    print("SUMMARY ranges:", " ".join(f"{a}-{b}" for a, b in ranges))

    if not bad_polys:
        print("ALL PREPROCESSED LDE OPENINGS MATCH (28 points x "
              f"{n_pre} polys)")
        # only then is the (slow) cap comparison interesting
        ours_cap = commit.cap_host()
        same = sum(1 for a, b in zip(ours_cap, vk.constants_sigmas_cap)
                   if list(map(int, a)) == list(map(int, b)))
        print(f"cap digests equal: {same}/{len(ours_cap)}")
        ours_vk = ser.write_verifier_only_circuit_data(outer.verifier_only)
        ref_vk_bytes = open(os.path.join(
            HERE, "tests/data/gl_regression_verifier.bin"), "rb").read()
        print("VerifierOnly bytes:",
              "IDENTICAL" if ours_vk == ref_vk_bytes else "differ")


if __name__ == "__main__":
    main()
