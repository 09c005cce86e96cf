"""Dump SHA-256 digests of every prover phase artifact for the bench circuit
with a FIXED witness, on the chosen backend (argv[1]: cpu|tpu) — diffing two
runs localizes the first diverging phase of the TPU-vs-CPU proof mismatch.
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from plonky2_goldibear_tpu.field import gl
from plonky2_goldibear_tpu.hash import poseidon_gl
from plonky2_goldibear_tpu.iop.generator import (generate_partial_witness,
                                                 seed_randomness)
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk import prover as P
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.fri.oracle import PolynomialBatch

SIZE_LOG = int(os.environ.get("SIZE_LOG", "12"))


def dig(name, arr):
    a = gl.to_ints(arr) if isinstance(arr, gl.GL) else np.asarray(arr)
    h = hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()[:16]
    print(f"{name}: {h} shape={a.shape}", flush=True)


def main():
    t0 = time.time()
    print("backend:", jax.default_backend(), flush=True)
    seed_randomness(42)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config_gl())
    x = builder.add_virtual_target()
    builder.register_public_input(x)
    cur = x
    for _ in range((1 << SIZE_LOG) * 20):
        cur = builder.arithmetic(1, 1, cur, cur, cur)
    builder.register_public_input(cur)
    data = builder.build()
    common, pd = data.common, data.prover_only
    print("build s:", round(time.time() - t0, 1), flush=True)
    dig("sigmas", np.asarray(pd.sigmas))
    dig("cs_coeffs", pd.constants_sigmas_commitment.coeffs)
    dig("cs_lde", pd.constants_sigmas_commitment.lde)
    dig("cs_cap", np.array(pd.constants_sigmas_commitment.cap_host(),
                           dtype=np.uint64))
    print("circuit_digest:", pd.circuit_digest, flush=True)

    pw = PartialWitness(); pw.set_target(x, 6)
    pwit = generate_partial_witness(pw, pd, common)
    witness = pwit.full_witness()
    dig("witness", witness)

    F, hasher = gl, poseidon_gl
    kern = P._kernels(pd, common, F, hasher)
    wires_values = F.from_ints(witness)
    wires_c = PolynomialBatch.from_values(
        F, wires_values, common.config.fri_config.rate_bits,
        common.config.fri_config.cap_height, hasher=hasher)
    dig("wires_coeffs", wires_c.coeffs)
    dig("wires_lde", wires_c.lde)
    dig("wires_cap", np.array(wires_c.cap_host(), dtype=np.uint64))

    # fixed fake challenges (exercise pp/quotient independent of transcript)
    betas = [7, 11]
    gammas = [13, 17]
    alphas = [19, 23]

    def to_arr(vals):
        return F.from_ints(np.array(vals, dtype=np.uint64))

    routed = jax.tree_util.tree_map(
        lambda a: a[:common.config.num_routed_wires], wires_values)
    zs_pp, any_zero = kern.pp_fn(routed, to_arr(betas), to_arr(gammas))
    dig("zs_pp", zs_pp)
    zs_pp_c = PolynomialBatch.from_values(
        F, zs_pp, common.config.fri_config.rate_bits,
        common.config.fri_config.cap_height, hasher=hasher)
    dig("zs_pp_lde", zs_pp_c.lde)

    pi_hash = hasher.hash_no_pad_host(
        pwit.get_targets(pd.public_inputs))
    q = kern.quotient_fn(pd.constants_sigmas_commitment.lde, wires_c.lde,
                         zs_pp_c.lde, to_arr(pi_hash), to_arr(betas),
                         to_arr(gammas), to_arr(alphas), to_arr([]),
                         to_arr([]))
    dig("quotient_chunks", q)

    zeta = (1234567, 7654321)
    evals = P.eval_commitment_at(F, zeta, wires_c)
    h = hashlib.sha256(repr(evals).encode()).hexdigest()[:16]
    print("wires_at_zeta:", h, flush=True)
    evals = P.eval_commitment_at(
        F, zeta, PolynomialBatch(F, q, common.config.fri_config.rate_bits,
                                 common.config.fri_config.cap_height,
                                 hasher=hasher))
    h = hashlib.sha256(repr(evals).encode()).hexdigest()[:16]
    print("quotient_at_zeta:", h, flush=True)
    print("done s:", round(time.time() - t0, 1), flush=True)


if __name__ == "__main__":
    main()
