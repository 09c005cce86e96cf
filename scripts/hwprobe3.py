"""Third-round probes: long-running kernels (in-kernel rep loops) so device
compute dominates tunnel noise.  Marginal = (t(2r) - t(r)) / r with each
t >= ~30ms of device work, min of 5.
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

SHAPE = (256, 512)
N = SHAPE[0] * SHAPE[1]


def _fetch(out):
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def _t(fn, args):
    t0 = time.perf_counter()
    _fetch(fn(*args))
    return time.perf_counter() - t0


def marginal_reps(make_run, args, r):
    """make_run(reps) -> jitted fn(*args).  Returns seconds per rep."""
    run1, run2 = make_run(r), make_run(2 * r)
    _t(run1, args)
    _t(run2, args)
    t1 = min(_t(run1, args) for _ in range(5))
    t2 = min(_t(run2, args) for _ in range(5))
    return (t2 - t1) / r if t2 > t1 else t2 / (2 * r)


def probe_u32(body16, name, r, per_rep_ops, dtype=jnp.uint32):
    rng = np.random.default_rng(0)
    if dtype == jnp.uint32:
        x_np = rng.integers(1, 1 << 31, size=SHAPE, dtype=np.uint32)
    else:
        x_np = (rng.random(SHAPE, dtype=np.float32) * 0.5 + 0.75)
    x = jnp.asarray(x_np, dtype=dtype)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(SHAPE, dtype)

    def make_run(reps):
        def kern(a_ref, o_ref):
            x0 = a_ref[:]

            def lbody(_, y):
                return body16(y, x0)

            o_ref[:] = jax.lax.fori_loop(0, reps, lbody, x0)

        @jax.jit
        def run(a):
            return pl.pallas_call(kern, in_specs=[spec], out_specs=spec,
                                  out_shape=osh)(a)

        return run

    sec_per_rep = marginal_reps(make_run, (x,), r)
    gops = N * per_rep_ops / sec_per_rep / 1e9
    print(json.dumps({name: round(gops, 1)}), flush=True)


def probe_gl(r=256):
    rng = np.random.default_rng(0)
    x = gl.from_ints(rng.integers(0, gl.P, size=SHAPE, dtype=np.uint64))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(SHAPE, jnp.uint32)

    def make_run(reps):
        def kern(lo_ref, hi_ref, o_lo, o_hi):
            x0 = GL(lo_ref[:], hi_ref[:])

            def lbody(_, st):
                y = kp._mul(GL(st[0], st[1]), x0)
                return (y.lo, y.hi)

            lo, hi = jax.lax.fori_loop(0, reps, lbody, (x0.lo, x0.hi))
            o_lo[:] = lo
            o_hi[:] = hi

        @jax.jit
        def run(lo, hi):
            return pl.pallas_call(kern, in_specs=[spec, spec],
                                  out_specs=(osh_spec := (spec, spec)),
                                  out_shape=(osh, osh))(lo, hi)

        return run

    sec = marginal_reps(make_run, (x.lo, x.hi), r)
    print(json.dumps({"gl_mul_G_per_s": round(N / sec / 1e9, 2),
                      "gl_mul_ns_each": round(sec / N * 1e9, 3)}), flush=True)


def probe_sbox(r=128):
    rng = np.random.default_rng(0)
    x = gl.from_ints(rng.integers(0, gl.P, size=SHAPE, dtype=np.uint64))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(SHAPE, jnp.uint32)

    def make_run(reps):
        def kern(lo_ref, hi_ref, o_lo, o_hi):
            x0 = GL(lo_ref[:], hi_ref[:])

            def lbody(_, st):
                y = kp._sbox(GL(st[0], st[1]))
                return (y.lo, y.hi)

            lo, hi = jax.lax.fori_loop(0, reps, lbody, (x0.lo, x0.hi))
            o_lo[:] = lo
            o_hi[:] = hi

        @jax.jit
        def run(lo, hi):
            return pl.pallas_call(kern, in_specs=[spec, spec],
                                  out_specs=(spec, spec),
                                  out_shape=(osh, osh))(lo, hi)

        return run

    sec = marginal_reps(make_run, (x.lo, x.hi), r)
    print(json.dumps({"sbox_G_per_s": round(N / sec / 1e9, 2)}), flush=True)


def probe_mxu_s8(r=64, m=1024, kdim=1024, nb=2048):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.integers(-100, 100, size=(m, kdim), dtype=np.int8))
    X = jnp.asarray(rng.integers(-100, 100, size=(kdim, nb), dtype=np.int8))

    def make_run(reps):
        @jax.jit
        def run(a, x0):
            def body(_, x):
                y = jax.lax.dot_general(a, x, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                return y[:kdim].astype(jnp.int8)

            return jax.lax.fori_loop(0, reps, body, x0)

        return run

    sec = marginal_reps(make_run, (A, X), r)
    print(json.dumps({"s8_matmul_T_MACs": round(m * kdim * nb / sec / 1e12,
                                                2)}), flush=True)


def probe_mxu_bf16(r=64, m=1024, kdim=1024, nb=2048):
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.random((m, kdim), dtype=np.float32),
                    dtype=jnp.bfloat16)
    X = jnp.asarray(rng.random((kdim, nb), dtype=np.float32),
                    dtype=jnp.bfloat16)

    def make_run(reps):
        @jax.jit
        def run(a, x0):
            def body(_, x):
                y = jax.lax.dot_general(a, x, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                return y[:kdim].astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, reps, body, x0)

        return run

    sec = marginal_reps(make_run, (A, X), r)
    print(json.dumps({"bf16_matmul_T_MACs": round(m * kdim * nb / sec / 1e12,
                                                  2)}), flush=True)


def main():
    names = sys.argv[1:] or ["mul", "mul16", "fma", "add", "gl", "sbox",
                             "s8", "bf16"]
    for nm in names:
        if nm == "mul":
            probe_u32(lambda y, x: y * x, "u32_mul_G", 512, 1)
        elif nm == "mul16":
            probe_u32(lambda y, x: ((y * (x >> 16)) & jnp.uint32(0xFFFF)),
                      "u32_mul16_G", 512, 1)
        elif nm == "fma":
            probe_u32(lambda y, x: y * x + jnp.float32(0.5), "f32_fma_G",
                      512, 1, dtype=jnp.float32)
        elif nm == "add":
            probe_u32(lambda y, x: y + x, "u32_add_G", 1024, 1)
        elif nm == "gl":
            probe_gl()
        elif nm == "sbox":
            probe_sbox()
        elif nm == "s8":
            probe_mxu_s8()
        elif nm == "bf16":
            probe_mxu_bf16()


if __name__ == "__main__":
    main()
