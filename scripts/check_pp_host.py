"""Host-recompute the permutation-argument Z / partial-product columns from
the witness + sigmas (python ints, reference prover.rs:449-546 semantics) and
compare against the device kern.pp_fn output — isolates whether _pp_jit
(cumprod/scan) miscomputes on this backend or the vanishing evaluation does.
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

from plonky2_goldibear_tpu.field import gl, host
from plonky2_goldibear_tpu.hash import poseidon_gl
from plonky2_goldibear_tpu.iop.generator import (generate_partial_witness,
                                                 seed_randomness)
from plonky2_goldibear_tpu.iop.witness import PartialWitness
from plonky2_goldibear_tpu.plonk import prover as P
from plonky2_goldibear_tpu.plonk.builder import CircuitBuilder
from plonky2_goldibear_tpu.plonk.config import CircuitConfig

SIZE_LOG = int(os.environ.get("SIZE_LOG", "12"))


def main():
    t0 = time.time()
    print("backend:", jax.default_backend(), "SIZE_LOG:", SIZE_LOG,
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
    common, pd = data.common, data.prover_only
    print("build s:", round(time.time() - t0, 1), flush=True)

    pw = PartialWitness(); pw.set_target(x, 6)
    pwit = generate_partial_witness(pw, pd, common)
    witness = pwit.full_witness()

    F = gl
    kern = P._kernels(pd, common, F, poseidon_gl)
    betas, gammas = [7, 11], [13, 17]

    def to_arr(vals):
        return F.from_ints(np.array(vals, dtype=np.uint64))

    routed = jax.tree_util.tree_map(
        lambda a: a[:common.config.num_routed_wires], witness_dev := F.from_ints(witness))
    zs_pp_dev, _ = kern.pp_fn(routed, to_arr(betas), to_arr(gammas))
    got = gl.to_ints(zs_pp_dev)            # (2*nch? , n) zs then pps

    # ---- host reference (python ints, reference semantics) ----
    p = common.spec.p
    n = common.degree
    nr = common.config.num_routed_wires
    qdf = common.quotient_degree_factor
    num_prods = common.num_partial_products
    nch = common.config.num_challenges
    sigmas = np.asarray(pd.sigmas)         # (nr, n) uint64
    sub = [int(v) for v in pd.subgroup]
    k_is = [int(k) for k in common.k_is]
    w = witness.astype(object)

    nchunks = -(-nr // qdf)
    zs_ref, pps_ref = [], []
    for ci in range(nch):
        beta, gamma = [7, 11][ci], [13, 17][ci]
        chunk_prods = np.ones((nchunks, n), dtype=object)
        for i in range(n):
            quots = []
            for j in range(nr):
                numer = (int(w[j, i]) + beta * k_is[j] * sub[i] + gamma) % p
                denom = (int(w[j, i]) + beta * int(sigmas[j, i]) + gamma) % p
                quots.append(numer * host.finv(denom, p) % p)
            for c in range(nchunks):
                acc = 1
                for j in range(c * qdf, min((c + 1) * qdf, nr)):
                    acc = acc * quots[j] % p
                chunk_prods[c, i] = acc
        row_prod = [1] * n
        for i in range(n):
            acc = 1
            for c in range(nchunks):
                acc = acc * int(chunk_prods[c, i]) % p
            row_prod[i] = acc
        z = [1] * n
        for i in range(1, n):
            z[i] = z[i - 1] * row_prod[i - 1] % p
        zs_ref.append(z)
        running = chunk_prods.copy()
        for c in range(1, nchunks):
            for i in range(n):
                running[c, i] = int(running[c - 1, i]) * int(chunk_prods[c, i]) % p
        accs = np.empty((num_prods, n), dtype=object)
        for k in range(num_prods):
            for i in range(n):
                accs[k, i] = int(running[k, i]) * z[i] % p
        pps_ref.append(accs)

    ref_rows = []
    for z in zs_ref:
        ref_rows.append(np.array(z, dtype=np.uint64))
    for accs in pps_ref:
        for k in range(num_prods):
            ref_rows.append(np.array([int(v) for v in accs[k]],
                                     dtype=np.uint64))
    ref = np.stack(ref_rows, axis=0)
    print("device zs_pp shape", got.shape, "ref shape", ref.shape, flush=True)
    if got.shape != ref.shape:
        print("SHAPE MISMATCH", flush=True)
        return
    diff = got != ref
    print("mismatched rows:", sorted(set(np.argwhere(diff)[:, 0].tolist()))[:20],
          "total cells:", int(diff.sum()), flush=True)
    if diff.any():
        r, c = np.argwhere(diff)[0]
        print("first diff at", (int(r), int(c)), hex(int(got[r, c])),
              "vs", hex(int(ref[r, c])), flush=True)
    else:
        print("ZS_PP MATCH — bug is in the vanishing rest evaluation",
              flush=True)
    print("done s:", round(time.time() - t0, 1), flush=True)


if __name__ == "__main__":
    main()
