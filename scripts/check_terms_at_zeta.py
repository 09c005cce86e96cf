"""Term-by-term prover-vs-verifier comparison at an out-of-domain point.

For the bench circuit with FIXED challenges: take each device-evaluated
vanishing term (per-gate contributions and the rest stack), coset-IFFT it
(every term has degree < m, so interpolation is exact), Horner-evaluate at a
fixed ext point zeta on the host, and compare against the VERIFIER's host
formula computed from true openings at zeta.  The first differing term is
the prover/verifier semantic divergence.
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

from plonky2_goldibear_tpu.field import gl, host, fft as fftm
from plonky2_goldibear_tpu.field.ext import gl2
from plonky2_goldibear_tpu.gates.base import HostExtAlgebra, EvaluationVars
from plonky2_goldibear_tpu.gates.base import compute_filter, eval_filtered
from plonky2_goldibear_tpu.hash import poseidon_gl
from plonky2_goldibear_tpu.iop.generator import (generate_partial_witness,
                                                 seed_randomness)
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk import prover as P
from plonky2_goldibear_tpu.plonk import vanishing
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig
from plonky2_goldibear_tpu.fri.oracle import PolynomialBatch

SIZE_LOG = int(os.environ.get("SIZE_LOG", "12"))
tree_map = jax.tree_util.tree_map


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
    spec = common.spec
    p = spec.p
    print("build s:", round(time.time() - t0, 1), flush=True)

    pw = PartialWitness(); pw.set_target(x, 6)
    pwit = generate_partial_witness(pw, pd, common)
    witness = pwit.full_witness()

    F = gl
    kern = P._kernels(pd, common, F, poseidon_gl)
    rate = common.config.fri_config.rate_bits
    ch = common.config.fri_config.cap_height
    wires_c = PolynomialBatch.from_values(F, F.from_ints(witness), rate, ch,
                                          hasher=poseidon_gl)
    betas, gammas, alphas = [7, 11], [13, 17], [19, 23]

    def to_arr(vals):
        return F.from_ints(np.array(vals, dtype=np.uint64))

    routed = tree_map(lambda a: a[:common.config.num_routed_wires],
                      F.from_ints(witness))
    zs_pp, _ = kern.pp_fn(routed, to_arr(betas), to_arr(gammas))
    zs_pp_c = PolynomialBatch.from_values(F, zs_pp, rate, ch,
                                          hasher=poseidon_gl)
    pi_hash = poseidon_gl.hash_no_pad_host(pwit.get_targets(pd.public_inputs))

    rest, gate_fns, finish = P._quotient_split_fns(F, common)
    rest_stack = rest(pd.constants_sigmas_commitment.lde, wires_c.lde,
                      zs_pp_c.lde, to_arr(pi_hash), to_arr(betas),
                      to_arr(gammas), to_arr(alphas), to_arr([]), to_arr([]),
                      kern.shifted_xs, kern.l_0,
                      kern.step, kern.next_step, kern.m)
    gate_contribs = [
        gate_fns[gi](pd.constants_sigmas_commitment.lde, wires_c.lde,
                     to_arr(pi_hash), to_arr(alphas), kern.step, kern.m)
        for gi in range(len(common.gates))]

    zeta = (123456789, 987654321)

    def term_at_zeta(values_i):
        """coset values (m,) -> coeffs -> host Horner at zeta (ext)."""
        coeffs = gl.to_ints(fftm.coset_ifft(F, values_i, spec.coset_shift))
        acc = host.ext_zero(spec)
        for c in reversed(coeffs.tolist()):
            acc = host.ext_mul(spec, acc, zeta)
            acc = host.ext_add(spec, acc, host.ext_from_base(spec, int(c)))
        return acc

    # true openings at zeta (host Horner on fetched coeffs)
    def open_all(orc, at):
        coeffs = gl.to_ints(orc.coeffs)
        out = []
        for r in range(coeffs.shape[0]):
            acc = host.ext_zero(spec)
            for c in reversed(coeffs[r].tolist()):
                acc = host.ext_mul(spec, acc, at)
                acc = host.ext_add(spec, acc, host.ext_from_base(spec, int(c)))
            out.append(acc)
        return out

    g = spec.two_adic_generator(common.degree_bits)
    zeta_next = host.ext_scalar_mul(spec, zeta, g)
    cs_open = open_all(pd.constants_sigmas_commitment, zeta)
    wires_open = open_all(wires_c, zeta)
    zs_open = open_all(zs_pp_c, zeta)
    zs_next_open = open_all(zs_pp_c, zeta_next)
    print("openings computed s:", round(time.time() - t0, 1), flush=True)

    c0, c1 = common.constants_range()
    s0, s1 = common.sigmas_range()
    z0, z1 = common.zs_range()
    pp0, pp1 = common.partial_products_range()
    A = HostExtAlgebra(spec)
    pih = [host.ext_from_base(spec, int(v)) for v in pi_hash]
    vars = EvaluationVars([c for c in cs_open[c0:c1]], wires_open, pih)

    # verifier-style l_0 and x
    n = common.degree
    zeta_pow_n = host.ext_pow(spec, zeta, n)
    l0_z = vanishing.eval_l_0_host(A, n, zeta, zeta_pow_n)

    # --- per-gate comparison ---
    offset = vanishing.count_rest_terms(common)
    ns = common.selectors_info.num_selectors
    for gi, gate in enumerate(common.gates):
        sel_idx = common.selectors_info.selector_indices[gi]
        group = common.selectors_info.groups[sel_idx]
        cs_list = [A.zero()] * gate.num_constraints()
        eval_filtered(A, gate, vars, gi, sel_idx, group, ns,
                      common.num_lookup_selectors, cs_list)
        for i, alpha_v in enumerate(alphas):
            alpha = host.ext_from_base(spec, alpha_v)
            comb = host.ext_zero(spec)
            for t in reversed(cs_list):
                comb = host.ext_add(spec, host.ext_mul(spec, comb, alpha), t)
            comb = host.ext_mul(spec, comb,
                                host.ext_pow(spec, alpha, offset))
            dev = term_at_zeta(tree_map(lambda a: a[i], gate_contribs[gi]))
            tag = "OK  " if tuple(comb) == tuple(dev) else "DIFF"
            print(f"{tag} gate {gate} ch{i}: host={comb} dev={dev}",
                  flush=True)

    # --- rest comparison (z1 + pp terms via the verifier's code path) ---
    rest_host_vals = vanishing.eval_vanishing_poly(
        A, common, zeta, l0_z, vars,
        zs_open[z0:z1], zs_next_open[z0:z1], zs_open[pp0:pp1],
        cs_open[s0:s1], betas, gammas, alphas,
        include_gate_constraints=False)
    for i in range(common.config.num_challenges):
        dev = term_at_zeta(tree_map(lambda a: a[i], rest_stack))
        hostv = rest_host_vals[i]
        tag = "OK  " if tuple(hostv) == tuple(dev) else "DIFF"
        print(f"{tag} rest ch{i}: host={hostv} dev={dev}", flush=True)
    print("done s:", round(time.time() - t0, 1), flush=True)


if __name__ == "__main__":
    main()
