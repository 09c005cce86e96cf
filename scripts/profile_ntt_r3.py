"""Round-3 on-chip NTT shootout: ops/ntt.py (VPU-fused) vs ops/ntt_mxu.py
(int8 MXU digit-plane) at the shapes that matter:

  - (1, 2^24): the bench.py headline shape
  - (256, 2^15): a realistic prover LDE batch (2^12-row circuit, rate 8)
  - (135, 2^18): wires commit of a 2^15-row circuit

Tunnel-proof timing: chained data-dependent iterations inside one jit,
marginal k-vs-2k with min-of-3 (see bench.py discipline).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from plonky2_goldibear_tpu.field import gl
from plonky2_goldibear_tpu.field.gl import GL


def _fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def _t(fn, args, k):
    t0 = time.perf_counter()
    _fetch(fn(*args, k))
    return time.perf_counter() - t0


def marginal(fn, args, k):
    _t(fn, args, k)
    _t(fn, args, 2 * k)
    t1 = min(_t(fn, args, k) for _ in range(3))
    t2 = min(_t(fn, args, 2 * k) for _ in range(3))
    if t2 <= t1:
        return t2 / (2 * k)
    return (t2 - t1) / k


def chain(step):
    # kk is a DYNAMIC argument: one compile serves every iteration count
    # (each big-program compile through the tunnel helper costs minutes)
    @jax.jit
    def run(lo, hi, kk):
        def body(_, st):
            r = step(GL(st[0], st[1]))
            return (r.lo, r.hi)

        lo, hi = jax.lax.fori_loop(0, kk, body, (lo, hi))
        # fetch only a tiny slice: pulling the full 134 MB output through the
        # tunnel measures network bandwidth, not the device (the fallback
        # branch of `marginal` amortizes the fetch when contention flips the
        # k-vs-2k ordering, which silently poisoned every large-output metric)
        return lo[..., :128], hi[..., :128]

    return run


def bench_shape(b, n, k=2):
    rng = np.random.default_rng(0)
    x = gl.from_ints(rng.integers(0, gl.P, size=(b, n), dtype=np.uint64))
    total = b * n
    out = {}
    from plonky2_goldibear_tpu.ops import ntt_mxu as M

    dt = marginal(chain(lambda g: M.fft(g)), (x.lo, x.hi), k)
    out[f"mxu_b{b}_n{n}_Melems_s"] = round(total / dt / 1e6, 1)
    from plonky2_goldibear_tpu.ops import ntt as V

    dt = marginal(chain(lambda g: V.fft(g)), (x.lo, x.hi), k)
    out[f"vpu_b{b}_n{n}_Melems_s"] = round(total / dt / 1e6, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    shapes = [(1, 1 << 24), (256, 1 << 15), (135, 1 << 18)]
    if len(sys.argv) > 1:
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in sys.argv[1].split(",")]
    for b, n in shapes:
        bench_shape(b, n)
