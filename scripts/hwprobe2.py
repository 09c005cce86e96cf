"""Second-round probes: pin down the integer-multiply cost model.

Variants, all (128,512) arrays in VMEM, chained k-vs-2k with real fetches:
  a. u32 mul chain, reps=32 vs 64 (does time scale with reps?)
  b. u32 mul chain on 16-bit-masked operands (does Mosaic fast-path?)
  c. i32 mul chain
  d. u32 add-only chain (the non-mul baseline)
  e. gl _mul chain reps=16 vs 32 (scale check)
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

SHAPE = (128, 512)
N = SHAPE[0] * SHAPE[1]


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


def chain_one(kern_body, x_np, reps, k=16):
    dtype = x_np.dtype
    x = jnp.asarray(x_np)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(SHAPE, dtype)

    def kern(a_ref, o_ref):
        o_ref[:] = kern_body(a_ref[:], reps)

    @functools.partial(jax.jit, static_argnames=("kk",))
    def run(a, kk):
        def body(_, st):
            return pl.pallas_call(kern, in_specs=[spec], out_specs=spec,
                                  out_shape=osh)(st)

        return jax.lax.fori_loop(0, kk, body, a)

    dt = marginal(run, (x,), k)
    return N * reps / dt


def body_mul(x, reps):
    y = x
    for _ in range(reps):
        y = y * x
    return y


def body_mul_masked(x, reps):
    y = x & jnp.uint32(0xFFFF)
    m = x >> 16
    for _ in range(reps):
        y = (y * m) & jnp.uint32(0xFFFF)
    return y


def body_mul_ilp4(x, reps):
    # 4 independent chains: tests latency-vs-throughput
    y0, y1 = x, x + jnp.uint32(1)
    y2, y3 = x + jnp.uint32(2), x + jnp.uint32(3)
    for _ in range(reps // 4):
        y0 = y0 * x
        y1 = y1 * x
        y2 = y2 * x
        y3 = y3 * x
    return y0 ^ y1 ^ y2 ^ y3


def body_add(x, reps):
    y = x
    for _ in range(reps):
        y = y + x
    return y


def main():
    rng = np.random.default_rng(0)
    xu = rng.integers(1, 1 << 31, size=SHAPE, dtype=np.uint32)
    xi = rng.integers(1, 1 << 30, size=SHAPE, dtype=np.int32)

    for reps in (32, 64):
        v = chain_one(body_mul, xu, reps)
        print(json.dumps({f"u32_mul_r{reps}_G": round(v / 1e9, 1)}),
              flush=True)
    v = chain_one(body_mul_masked, xu, 64)
    print(json.dumps({"u32_mul16_G": round(v / 1e9, 1)}), flush=True)
    v = chain_one(body_mul_ilp4, xu, 64)
    print(json.dumps({"u32_mul_ilp4_G": round(v / 1e9, 1)}), flush=True)
    v = chain_one(body_mul, xi, 64)
    print(json.dumps({"i32_mul_G": round(v / 1e9, 1)}), flush=True)
    v = chain_one(body_add, xu, 64)
    print(json.dumps({"u32_add_G": round(v / 1e9, 1)}), flush=True)

    # gl-mul chain, reps scaling check
    x = gl.from_ints(rng.integers(0, gl.P, size=SHAPE, dtype=np.uint64))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(SHAPE, jnp.uint32)

    for reps in (16, 32):
        def kern(lo_ref, hi_ref, o_lo, o_hi, reps=reps):
            xx = GL(lo_ref[:], hi_ref[:])
            y = xx
            for _ in range(reps):
                y = kp._mul(y, xx)
            o_lo[:] = y.lo
            o_hi[:] = y.hi

        @functools.partial(jax.jit, static_argnames=("kk",))
        def run(lo, hi, kk, kern=kern):
            def body(_, st):
                return pl.pallas_call(kern, in_specs=[spec, spec],
                                      out_specs=(spec, spec),
                                      out_shape=(osh, osh))(st[0], st[1])

            return jax.lax.fori_loop(0, kk, body, (lo, hi))

        dt = marginal(run, (x.lo, x.hi), 16)
        print(json.dumps({f"gl_mul_r{reps}_G": round(N * reps / dt / 1e9, 2),
                          f"gl_mul_r{reps}_us_per_launch":
                          round(dt * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
