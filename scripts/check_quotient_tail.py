"""Discriminator for the TPU vanishing-check failure: rebuild the bench
circuit, compute the vanishing values / Z_H on the quotient domain, and
check whether the coset-IFFT coefficients BEYOND quotient_degree are zero.

- nonzero tail  -> the evaluated constraints are NOT divisible by Z_H:
  the witness violates constraints under this backend's evaluation
  (or the vanishing evaluation itself diverges).
- zero tail     -> division exact; the bug is downstream (openings/FRI).

Also evaluates the vanishing identity at a fixed point zeta directly from
coefficients as a cross-check.
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

import numpy as np

from plonky2_goldibear_tpu.field import gl, fft as fftm
from plonky2_goldibear_tpu.hash import poseidon_gl
from plonky2_goldibear_tpu.iop.generator import (generate_partial_witness,
                                                 seed_randomness)
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk import prover as P
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.fri.oracle import PolynomialBatch

SIZE_LOG = int(os.environ.get("SIZE_LOG", "12"))


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

    pw = PartialWitness(); pw.set_target(x, 6)
    pwit = generate_partial_witness(pw, pd, common)
    witness = pwit.full_witness()

    F, hasher = gl, poseidon_gl
    kern = P._kernels(pd, common, F, hasher)
    rate = common.config.fri_config.rate_bits
    ch = common.config.fri_config.cap_height
    wires_values = F.from_ints(witness)
    wires_c = PolynomialBatch.from_values(F, wires_values, rate, ch,
                                          hasher=hasher)
    betas, gammas, alphas = [7, 11], [13, 17], [19, 23]

    def to_arr(vals):
        return F.from_ints(np.array(vals, dtype=np.uint64))

    routed = jax.tree_util.tree_map(
        lambda a: a[:common.config.num_routed_wires], wires_values)
    zs_pp, _ = kern.pp_fn(routed, to_arr(betas), to_arr(gammas))
    zs_pp_c = PolynomialBatch.from_values(F, zs_pp, rate, ch, hasher=hasher)
    pi_hash = hasher.hash_no_pad_host(pwit.get_targets(pd.public_inputs))

    # recompute total vanishing values (rest + gate contribs) WITHOUT the
    # divide/truncate, then do the division and inspect the tail
    rest, gate_fns, finish = P._quotient_split_fns(F, common)
    args = (pd.constants_sigmas_commitment.lde, wires_c.lde, zs_pp_c.lde)
    rest_stack = rest(*args, to_arr(pi_hash), to_arr(betas), to_arr(gammas),
                      to_arr(alphas), to_arr([]), to_arr([]),
                      kern.shifted_xs, kern.l_0,
                      kern.step, kern.next_step, kern.m)
    total = rest_stack
    contribs = {}
    for gi in range(len(common.gates)):
        c = gate_fns[gi](pd.constants_sigmas_commitment.lde, wires_c.lde,
                         to_arr(pi_hash), to_arr(alphas), kern.step, kern.m)
        contribs[str(common.gates[gi])] = c
        total = F.add(total, c)

    # the true quotient has degree <= deg(v) - n < 7n while the values-form
    # division always yields SOME degree-<m polynomial; divisibility shows as
    # the top n coefficients being zero
    qd = kern.m - common.degree
    for i in range(common.config.num_challenges):
        v = jax.tree_util.tree_map(lambda a: a[i], total)
        qv = F.mul(v, kern.zh_inv)
        qc = fftm.coset_ifft(F, qv, common.spec.coset_shift)
        tail = gl.to_ints(jax.tree_util.tree_map(lambda a: a[qd:], qc))
        nz = int((tail != 0).sum())
        print(f"challenge {i}: tail nonzeros = {nz} / {tail.size}",
              flush=True)
        if nz:
            # which domain rows violate constraints?  vanishing values must
            # be zero at the n subgroup points (stride qdf into the coset? no
            # — check total at the points where Z_H=0 has no meaning; instead
            # evaluate total on the SUBGROUP: ifft of v gives the vanishing
            # poly's coeffs; evaluate cheaply via another fft on the subgroup
            vc = fftm.coset_ifft(F, v, common.spec.coset_shift)
            sub_vals = fftm.fft(F, jax.tree_util.tree_map(
                lambda a: a[:common.degree * 8].reshape(8, common.degree),
                vc))
            # p(x) on subgroup = sum_j x^{jn} * (chunk_j evaluated) — just
            # report per-gate contribution tails instead (cheaper signal)
            for name, c in contribs.items():
                cv = jax.tree_util.tree_map(lambda a: a[i], c)
                qv2 = F.mul(cv, kern.zh_inv)
                qc2 = fftm.coset_ifft(F, qv2, common.spec.coset_shift)
                t2 = gl.to_ints(jax.tree_util.tree_map(
                    lambda a: a[qd:], qc2))
                print(f"  gate {name}: tail nz = {int((t2 != 0).sum())}",
                      flush=True)
            rv = jax.tree_util.tree_map(lambda a: a[i], rest_stack)
            qv2 = F.mul(rv, kern.zh_inv)
            qc2 = fftm.coset_ifft(F, qv2, common.spec.coset_shift)
            t2 = gl.to_ints(jax.tree_util.tree_map(lambda a: a[qd:], qc2))
            print(f"  rest terms: tail nz = {int((t2 != 0).sum())}",
                  flush=True)
            break
    print("done s:", round(time.time() - t0, 1), flush=True)


if __name__ == "__main__":
    main()
