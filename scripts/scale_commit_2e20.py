"""Scale demo: a 2^20-degree, 135-poly PolynomialBatch commit on the real
chip (LDE rate 1/8 -> 2^23 points, 8.4M-leaf Merkle tree with cap 4) —
half of the BASELINE configs[4] per-proof load (2^24-point LDE).

Prints one JSON line (the marginal k-vs-2k discipline from bench.py) with
elements/s.  Memory: the dense commit materializes LDE + leaf transpose
(~25 GB at 2^20x135 — beyond one v5e's 15.75 GB HBM; measured OOM), so
STREAM=1 uses oracle.commit_values_streaming (RATE-poly blocks absorbed
into the sponge states; peak memory independent of num_polys) which fits
2^20 on one chip.  DEGREE_LOG=18 is the largest dense single-chip size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonky2_goldibear_tpu.field import gl
from plonky2_goldibear_tpu.fri import oracle

NUM_POLYS = int(os.environ.get("NUM_POLYS", "135"))
DEGREE_LOG = int(os.environ.get("DEGREE_LOG", "20"))
STREAM = bool(int(os.environ.get("STREAM", "0")))
RATE_BITS = 3
CAP_HEIGHT = 4


def main():
    n = 1 << DEGREE_LOG
    rng = np.random.default_rng(7)
    vals = gl.from_ints(rng.integers(0, gl.P, size=(NUM_POLYS, n),
                                     dtype=np.uint64))

    import jax.numpy as jnp

    def one_commit(v):
        if STREAM:
            _, levels = oracle.commit_values_streaming(
                gl, v, RATE_BITS, CAP_HEIGHT, gl.SPEC.coset_shift,
                oracle.poseidon_gl)
        else:
            _, _, _, levels = oracle.commit_values(
                gl, v, RATE_BITS, CAP_HEIGHT, gl.SPEC.coset_shift,
                oracle.poseidon_gl)
        return levels[-1]

    @jax.jit
    def commit_k(lo, hi, k):
        def step(_, carry):
            clo, chi = carry
            cap = one_commit(gl.GL(clo, chi))
            clo = clo ^ (cap.lo[0, 0] & 1)      # data dependency
            return (clo, chi)

        lo, hi = jax.lax.fori_loop(0, k, step, (lo, hi))
        cap = one_commit(gl.GL(lo, hi))
        return cap.lo, cap.hi

    def t_of(k):
        t0 = time.perf_counter()
        out = commit_k(vals.lo, vals.hi, np.int32(k))
        for leaf in out:
            np.asarray(leaf)
        return time.perf_counter() - t0

    t_of(1)          # compile + warm
    t_of(2)
    t1 = min(t_of(1) for _ in range(3))
    t2 = min(t_of(2) for _ in range(3))
    per_commit = (t2 - t1) if t2 > t1 else t2 / 2
    elems = NUM_POLYS * (n << RATE_BITS)
    print(json.dumps({
        "metric": "commit%s_2e%d_s" % ("_stream" if STREAM else "", DEGREE_LOG),
        "value": round(per_commit, 4),
        "unit": "s/commit",
        "extra": {
            "num_polys": NUM_POLYS,
            "lde_points": n << RATE_BITS,
            "lde_elems_per_s": round(elems / per_commit, 1),
            "backend": jax.default_backend(),
        },
    }))


if __name__ == "__main__":
    main()
