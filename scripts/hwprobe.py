"""Hardware cost-model probes for the v5e chip behind the tunnel.

Measures (honest fetch timing, k-vs-2k marginal):
  1. raw VPU u32 multiply chain (ops/s)
  2. raw VPU f32 mul+add chain (flops/s)
  3. GL (lazy) 64x64 mod-p multiply chain (muls/s)
  4. s8 x s8 -> s32 matmul (MACs/s)  -- the MXU int path
  5. bf16 matmul (MACs/s)            -- the MXU float path

Everything is chained with data dependencies inside one jitted program and
timed by fetching the output; block_until_ready is untrusted on this tunnel.
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


SHAPE = (128, 512)          # 64K lanes, tiny VMEM footprint
REPS = 128


def _u32mul_kernel(a_ref, o_ref):
    x = a_ref[:]
    y = x
    for _ in range(REPS):
        y = y * x + jnp.uint32(1)   # mul + add per step
    o_ref[:] = y


def _f32_kernel(a_ref, o_ref):
    x = a_ref[:]
    y = x
    for _ in range(REPS):
        y = y * x + jnp.float32(1.5)  # should fuse to one FMA per step
    o_ref[:] = y


def _chain_pallas(kern, x, k, dtype):
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(SHAPE, dtype)

    @functools.partial(jax.jit, static_argnames=("kk",))
    def run(a, kk):
        def body(_, st):
            return pl.pallas_call(kern, in_specs=[spec], out_specs=spec,
                                  out_shape=osh)(st)

        return jax.lax.fori_loop(0, kk, body, a)

    return marginal(run, (x,), k)


def sec_vpu():
    n = SHAPE[0] * SHAPE[1]
    rng = np.random.default_rng(0)
    xu = jnp.asarray(rng.integers(1, 1 << 31, size=SHAPE, dtype=np.uint32))
    dt = _chain_pallas(_u32mul_kernel, xu, 16, jnp.uint32)
    print(json.dumps({"u32_muladd_G_per_s": round(n * REPS / dt / 1e9, 1)}),
          flush=True)
    xf = jnp.asarray(rng.random(SHAPE, dtype=np.float32) + 0.5)
    dt = _chain_pallas(_f32_kernel, xf, 16, jnp.float32)
    print(json.dumps({"f32_fma_G_per_s": round(n * REPS / dt / 1e9, 1)}),
          flush=True)


def _glmul_kernel(lo_ref, hi_ref, o_lo, o_hi):
    x = GL(lo_ref[:], hi_ref[:])
    y = x
    for _ in range(64):
        y = kp._mul(y, x)
    o_lo[:] = y.lo
    o_hi[:] = y.hi


def sec_glmul():
    n = SHAPE[0] * SHAPE[1]
    rng = np.random.default_rng(0)
    x = gl.from_ints(rng.integers(0, gl.P, size=SHAPE, dtype=np.uint64))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(SHAPE, jnp.uint32)

    @functools.partial(jax.jit, static_argnames=("kk",))
    def run(lo, hi, kk):
        def body(_, st):
            return pl.pallas_call(_glmul_kernel,
                                  in_specs=[spec, spec],
                                  out_specs=(spec, spec),
                                  out_shape=(osh, osh))(st[0], st[1])

        return jax.lax.fori_loop(0, kk, body, (lo, hi))

    dt = marginal(run, (x.lo, x.hi), 16)
    print(json.dumps({"gl_mul_G_per_s": round(n * 64 / dt / 1e9, 2)}),
          flush=True)


def _mm_probe(dtype, acc, m, kdim, nb, chaink):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        A = jnp.asarray(rng.integers(-100, 100, size=(m, kdim),
                                     dtype=np.int8))
        X = jnp.asarray(rng.integers(-100, 100, size=(kdim, nb),
                                     dtype=np.int8))
    else:
        A = jnp.asarray(rng.random((m, kdim), dtype=np.float32),
                        dtype=dtype)
        X = jnp.asarray(rng.random((kdim, nb), dtype=np.float32),
                        dtype=dtype)

    @functools.partial(jax.jit, static_argnames=("kk",))
    def run(a, x, kk):
        def body(_, st):
            y = jax.lax.dot_general(a, st, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc)
            # feed back: cast to input dtype, keep shape (m==kdim required
            # for a clean chain; otherwise slice)
            return y[:kdim].astype(dtype)

        return jax.lax.fori_loop(0, kk, body, x)

    dt = marginal(run, (A, X), chaink)
    return m * kdim * nb / dt


def sec_mxu():
    v = _mm_probe(jnp.int8, jnp.int32, 2048, 2048, 8192, 8)
    print(json.dumps({"s8_matmul_T_MACs": round(v / 1e12, 2)}), flush=True)
    v = _mm_probe(jnp.bfloat16, jnp.float32, 2048, 2048, 8192, 8)
    print(json.dumps({"bf16_matmul_T_MACs": round(v / 1e12, 2)}), flush=True)
    v = _mm_probe(jnp.float32, jnp.float32, 2048, 2048, 8192, 8)
    print(json.dumps({"f32_matmul_T_MACs": round(v / 1e12, 2)}), flush=True)


ALL = {"vpu": sec_vpu, "glmul": sec_glmul, "mxu": sec_mxu}


def main():
    names = sys.argv[1:] or list(ALL)
    for nm in names:
        ALL[nm]()


if __name__ == "__main__":
    main()
