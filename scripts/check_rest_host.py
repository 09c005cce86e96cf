"""Bisect the vanishing 'rest' divergence:

1. low-degree check of every oracle LDE on device (coset_ifft tail == 0 and
   head == the oracle's coeffs);
2. recompute the rest terms (z1 + partial-product checks) ON HOST from
   fetched LDE columns at a few coset points and compare with the device
   rest_stack at the same points.
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
from plonky2_goldibear_tpu.hash import poseidon_gl
from plonky2_goldibear_tpu.iop.generator import (generate_partial_witness,
                                                 seed_randomness)
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk import prover as P
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

    n = common.degree
    p = common.spec.p

    # ---- 1. low-degree + coeff-head checks, on device ----
    @jax.jit
    def ld_check(lde, coeffs):
        c2 = fftm.coset_ifft(F, lde, common.spec.coset_shift)
        tail_nz = (c2.lo[:, n:] != 0) | (c2.hi[:, n:] != 0)
        head_ne = ((c2.lo[:, :n] != coeffs.lo) |
                   (c2.hi[:, :n] != coeffs.hi))
        return tail_nz.sum(), head_ne.sum()

    for name, orc in [("cs", pd.constants_sigmas_commitment),
                      ("wires", wires_c), ("zs_pp", zs_pp_c)]:
        t, h = ld_check(orc.lde, orc.coeffs)
        print(f"lowdeg {name}: tail_nz={int(t)} head_ne={int(h)}", flush=True)

    # ---- 2. host recompute of rest terms at a few coset points ----
    rest, gate_fns, finish = P._quotient_split_fns(F, common)
    rest_stack = rest(pd.constants_sigmas_commitment.lde, wires_c.lde,
                      zs_pp_c.lde, to_arr(pi_hash), to_arr(betas),
                      to_arr(gammas), to_arr(alphas), to_arr([]), to_arr([]),
                      kern.shifted_xs, kern.l_0,
                      kern.step, kern.next_step, kern.m)
    rest_host = gl.to_ints(rest_stack)          # (nch, m)

    m = kern.m
    cs_lde = gl.to_ints(tree_map(lambda a: a[:, :], pd.constants_sigmas_commitment.lde))
    wires_lde = gl.to_ints(wires_c.lde)
    zs_lde = gl.to_ints(zs_pp_c.lde)
    l0 = gl.to_ints(kern.l_0)
    sx = gl.to_ints(kern.shifted_xs)

    nr = common.config.num_routed_wires
    qdf = common.quotient_degree_factor
    num_prods = common.num_partial_products
    k_is = [int(k) for k in common.k_is]
    s0, s1 = common.sigmas_range()
    z0, z1 = common.zs_range()
    pp0, pp1 = common.partial_products_range()
    nch = common.config.num_challenges
    alpha_terms = None

    cols = [0, 1, 9, (1 << SIZE_LOG) * 4 + 3]
    nchunks = -(-nr // qdf)
    for j in cols:
        # term order mirrors eval_vanishing_poly: all challenges' z1 terms,
        # then all challenges' partial-product chunk terms
        z1_terms, pp_terms = [], []
        per_ch_detail = []
        for i in range(nch):
            beta, gamma = betas[i], gammas[i]
            xq = int(sx[j])
            z_x = int(zs_lde[z0 + i, j])
            z_gx = int(zs_lde[z0 + i, (j + kern.next_step) % m])
            z1_terms.append(int(l0[j]) * (z_x - 1) % p)
            nums, dens = [], []
            for w_i in range(nr):
                wv = int(wires_lde[w_i, j])
                sid = k_is[w_i] * xq % p
                sig = int(cs_lde[s0 + w_i, j])
                nums.append((wv + beta * sid + gamma) % p)
                dens.append((wv + beta * sig + gamma) % p)
            pad = nchunks * qdf - nr
            nums += [1] * pad
            dens += [1] * pad
            prevs = [z_x] + [int(zs_lde[pp0 + i * num_prods + k, j])
                             for k in range(num_prods)]
            nxts = prevs[1:] + [z_gx]
            ch_terms = []
            for c in range(nchunks):
                np_ = 1
                dp_ = 1
                for t in range(c * qdf, (c + 1) * qdf):
                    np_ = np_ * nums[t] % p
                    dp_ = dp_ * dens[t] % p
                ch_terms.append((prevs[c] * np_ - nxts[c] * dp_) % p)
            pp_terms.extend(ch_terms)
            per_ch_detail.append((z1_terms[-1], ch_terms))
        terms = z1_terms + pp_terms
        for i in range(nch):
            alpha = alphas[i]
            acc = 0
            for t in reversed(terms):
                acc = (acc * alpha + t) % p
            dev = int(rest_host[i, j])
            tag = "OK " if acc == dev else "DIFF"
            print(f"{tag} col {j} ch {i}: host={hex(acc)} dev={hex(dev)}",
                  flush=True)
        if j == cols[0]:
            for i, (z1t, cht) in enumerate(per_ch_detail):
                print(f"  detail ch{i}: z1={hex(z1t)} pp0={hex(cht[0])} "
                      f"pp_last={hex(cht[-1])}", flush=True)
    print("done s:", round(time.time() - t0, 1), flush=True)


if __name__ == "__main__":
    main()
