"""Oracle-validation for the digest-identity workstream.

Rebuild the regression outer circuit, then compare our preprocessed
polynomials against the reference proof along TWO independent channels:

1. zeta openings: evaluate our constants_sigmas polys at the transcript's
   zeta and compare with proof.openings.constants / plonk_sigmas (pure
   polynomial evaluation — independent of any Merkle-leaf index mapping).
2. the 28 FRI query leaves (as diagnose_regression_vk does).

If (2) mismatches but (1) matches, the leaf-index mapping in the diagnose
script is wrong, not the circuit.  Also saves the LDE + values to
/tmp/regression_pre.npz so later checks can skip the rebuild.
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
    zeta = challenges["plonk_zeta"]
    print("zeta =", zeta, flush=True)

    sys.path.insert(0, os.path.join(HERE, "scripts"))
    from compare_regression_build import build_inner, build_outer
    from plonky2_goldibear_tpu.plonk.config import CircuitConfig

    config = CircuitConfig.standard_recursion_zk_config_gl()
    print("building inner...", flush=True)
    inner = build_inner(config)
    print("building outer...", flush=True)
    outer = build_outer(inner, config)
    commit = outer.prover_only.constants_sigmas_commitment

    lde = commit.lde_host()
    np.savez_compressed("/tmp/regression_pre.npz", lde=lde)
    print("saved /tmp/regression_pre.npz", flush=True)

    # channel 1: zeta openings via host Horner on the coefficient form
    spec = common.spec
    coeffs = commit.F.to_ints(commit.coeffs)  # (num_polys, degree) uint64
    n_pre = coeffs.shape[0]
    ref_at_zeta = [tuple(int(x) for x in v)
                   for v in (list(proof_wp.proof.openings.constants)
                             + list(proof_wp.proof.openings.plonk_sigmas))]
    bad = []
    for p_idx in range(n_pre):
        acc = (0, 0)
        for c in reversed([int(c) for c in coeffs[p_idx]]):
            acc = host.ext_add(spec, host.ext_mul(spec, acc, zeta),
                               host.ext_from_base(spec, c))
        if acc != ref_at_zeta[p_idx]:
            bad.append(p_idx)
    if not bad:
        print(f"ZETA OPENINGS: all {n_pre} polys MATCH the reference proof")
    else:
        rng = []
        for p in bad:
            if rng and p == rng[-1][1] + 1:
                rng[-1][1] = p
            else:
                rng.append([p, p])
        print(f"ZETA OPENINGS: {len(bad)}/{n_pre} DIFFER, ranges:",
              " ".join(f"{a}-{b}" for a, b in rng))

    # channel 2: FRI query leaves (same as diagnose)
    q_indices = challenges["fri_query_indices"]
    lde_bits = common.degree_bits + common.config.fri_config.rate_bits
    ref_leaves = []
    for rnd in proof_wp.proof.opening_proof.query_round_proofs:
        leaf, _sib = rnd.initial_trees_proof.evals_proofs[0]
        ref_leaves.append([int(v) for v in leaf])
    bad2 = set()
    for qi, x_index in enumerate(q_indices):
        nat = host.reverse_bits(x_index, lde_bits)
        for p_idx in range(n_pre):
            if int(lde[p_idx, nat]) != ref_leaves[qi][p_idx]:
                bad2.add(p_idx)
    print(f"QUERY LEAVES: {len(bad2)}/{n_pre} polys differ")


if __name__ == "__main__":
    main()
