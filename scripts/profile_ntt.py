"""Microbenchmark the NTT kernel components on the real chip.

Isolates: (a) the fused kernel at various (B, n) shapes, (b) the four-step
wrapper at 2^24, (c) lane-stage vs sublane-stage cost, (d) XLA u32 transpose,
to find where the 2^24 wall-clock goes.  Device-chained fori_loop timing
(tunnel-proof): one dispatch runs k data-dependent iterations.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from plonky2_goldibear_tpu.field import gl
from plonky2_goldibear_tpu.field.gl import GL
from plonky2_goldibear_tpu.ops import ntt as kntt


def chain_time(make_step, x, k):
    """Time k data-dependent iterations of step inside one jitted program."""

    @functools.partial(jax.jit, static_argnames=("kk",))
    def run(lo, hi, kk):
        def body(_, st):
            r = make_step(GL(st[0], st[1]))
            return (r.lo, r.hi)
        lo, hi = jax.lax.fori_loop(0, kk, body, (lo, hi))
        return lo, hi

    jax.block_until_ready(run(x.lo, x.hi, k))
    jax.block_until_ready(run(x.lo, x.hi, 2 * k))
    t1 = min(_t(run, x, k) for _ in range(3))
    t2 = min(_t(run, x, 2 * k) for _ in range(3))
    return max((t2 - t1) / k, t2 / (2 * k) if t2 <= t1 else (t2 - t1) / k)


def _t(run, x, k):
    t0 = time.perf_counter()
    jax.block_until_ready(run(x.lo, x.hi, k))
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    out = {}

    # (a) fused kernel, shapes the four-step uses at 2^24: (4096, 4096)
    for b, n in [(4096, 4096), (64, 65536), (256, 16384), (16, 65536)]:
        x = gl.from_ints(rng.integers(0, gl.P, size=(b, n), dtype=np.uint64))
        nl = int(np.log2(n))
        dt = chain_time(lambda s, nl=nl: kntt._fft_fused(s, nl), x, k=2)
        out[f"fused_{b}x{n}"] = {"s": round(dt, 4),
                                 "elems_per_s": round(b * n / dt, 0)}
        print(json.dumps({f"fused_{b}x{n}": out[f"fused_{b}x{n}"]}),
              flush=True)

    # (b) four-step at 2^24
    x = gl.from_ints(rng.integers(0, gl.P, size=(1, 1 << 24),
                                  dtype=np.uint64))
    dt = chain_time(lambda s: kntt._fft_four_step(s, 24), x, k=2)
    out["four_step_2e24"] = {"s": round(dt, 4),
                             "elems_per_s": round((1 << 24) / dt, 0)}
    print(json.dumps({"four_step_2e24": out["four_step_2e24"]}), flush=True)

    # (d) XLA u32 transpose of (4096, 4096) pair (the four-step reshard cost)
    a = jnp.asarray(rng.integers(0, 2**32, size=(4096, 4096), dtype=np.uint32))

    @functools.partial(jax.jit, static_argnames=("kk",))
    def tr(a, kk):
        def body(_, a):
            return a.T + jnp.uint32(1)
        return jax.lax.fori_loop(0, kk, body, a)

    jax.block_until_ready(tr(a, 4)); jax.block_until_ready(tr(a, 8))
    t1 = min(_t2(tr, a, 4) for _ in range(3))
    t2 = min(_t2(tr, a, 8) for _ in range(3))
    dt = max((t2 - t1) / 4, 1e-9)
    out["transpose_4096"] = {"s": round(dt, 5)}
    print(json.dumps({"transpose_4096": out["transpose_4096"]}), flush=True)

    # (c) stage-type isolation inside the fused kernel: lane-only vs
    # sublane-only, via start_stage on a 2^12 poly batch
    b, n, nl = 4096, 4096, 12
    x = gl.from_ints(rng.integers(0, gl.P, size=(b, n), dtype=np.uint64))
    dt_all = chain_time(lambda s: kntt._fft_fused(s, nl, 0), x, k=2)
    dt_sub = chain_time(lambda s: kntt._fft_fused(s, nl, 7), x, k=2)
    out["stages_all_vs_sublane"] = {
        "all12_s": round(dt_all, 4), "sublane5_s": round(dt_sub, 4),
        "lane7_s": round(dt_all - dt_sub, 4)}
    print(json.dumps({"stages": out["stages_all_vs_sublane"]}), flush=True)

    print(json.dumps(out))


def _t2(run, a, k):
    t0 = time.perf_counter()
    jax.block_until_ready(run(a, k))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
