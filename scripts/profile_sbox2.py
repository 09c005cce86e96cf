"""Sbox liveness experiment, large-work edition.

Each timed dispatch runs ~1e9 sbox (or mul) evaluations on-device so that
tunnel RTT jitter (~ms) is <1% of the measurement; no marginal subtraction
needed.  Compares, within one run:
  - raw dependent GL-mul chain (the 2-live-array pattern)
  - classic x^7 = x^3 * x^4            (4 live arrays)
  - serial  x^7 = ((x * x^2)^2) * x    (2 live arrays)
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plonky2_goldibear_tpu.field import gl
from plonky2_goldibear_tpu.field.gl import GL
from plonky2_goldibear_tpu.ops import poseidon_gl as kp

SHAPE = (8, 8192)
REPS = 64          # chain depth inside the pallas kernel
K = 256            # pallas invocations per dispatch (fori_loop)


def _fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def _sbox_serial(x: GL) -> GL:
    t = kp._sqr(x)
    t = kp._mul(t, x)
    t = kp._sqr(t)
    return kp._mul(t, x)


def _mul_by_orig(x: GL, orig: GL) -> GL:
    return kp._mul(x, orig)


def _chain_kernel(lo_ref, hi_ref, o_lo, o_hi, *, reps, fn):
    x = GL(lo_ref[:], hi_ref[:])
    for _ in range(reps):
        x = fn(x)
    o_lo[:] = x.lo
    o_hi[:] = x.hi


def bench(fn, label):
    rng = np.random.default_rng(0)
    x = gl.from_ints(rng.integers(0, gl.P, size=SHAPE, dtype=np.uint64))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(SHAPE, jnp.uint32)

    def call(lo, hi):
        return pl.pallas_call(
            functools.partial(_chain_kernel, reps=REPS, fn=fn),
            in_specs=[spec, spec], out_specs=(spec, spec),
            out_shape=(osh, osh))(lo, hi)

    @jax.jit
    def run(lo, hi, kk):
        def body(_, st):
            return call(st[0], st[1])
        lo2, hi2 = jax.lax.fori_loop(0, kk, body, (lo, hi))
        return lo2[:, :128], hi2[:, :128]

    _fetch(run(x.lo, x.hi, 1))          # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _fetch(run(x.lo, x.hi, K))
        times.append(time.perf_counter() - t0)
    n = SHAPE[0] * SHAPE[1]
    total = n * REPS * K
    dt = sorted(times)[1]               # median of 3
    print(json.dumps({label + "_G_per_s": round(total / dt / 1e9, 3),
                      label + "_dispatch_s": round(dt, 3)}), flush=True)


if __name__ == "__main__":
    bench(kp._sqr, "sqr")
    bench(_sbox_serial, "serial_x7")
    bench(kp._sbox, "classic_x7")
