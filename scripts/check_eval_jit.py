"""Direct exactness check of _eval_commitments_jit on the current backend:
random coeff batches evaluated at a random ext point, compared against exact
host (python-int) Horner evaluation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from plonky2_goldibear_tpu.field import gl, host
from plonky2_goldibear_tpu.plonk import prover as P

SPEC = host.GOLDILOCKS


def host_eval(coeffs_ints, zeta):
    """Exact Horner over the ext field, python ints."""
    acc = host.ext_zero(SPEC)
    for c in reversed(coeffs_ints):
        acc = host.ext_mul(SPEC, acc, zeta)
        acc = host.ext_add(SPEC, acc, host.ext_from_base(SPEC, int(c)))
    return acc


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)
    n = 1 << 10
    npolys = 84
    coeffs = rng.integers(0, gl.P, size=(npolys, n), dtype=np.uint64)
    zeta = tuple(int(v) for v in rng.integers(0, gl.P, size=2,
                                              dtype=np.uint64))
    batch = gl.from_ints(coeffs)
    (evals,) = P._eval_commitments_jit(
        gl, (0,), (batch,), (P._ext_scalar_dev(gl, zeta),))
    dev = [gl.to_ints(c) for c in evals]
    bad = 0
    for i in range(npolys):
        want = host_eval(coeffs[i], zeta)
        got = tuple(int(dev[d][i]) for d in range(2))
        if want != got:
            bad += 1
            if bad <= 3:
                print(f"poly {i}: want {want} got {got}", flush=True)
    print("mismatches:", bad, "/", npolys, flush=True)


if __name__ == "__main__":
    main()
