"""Honest on-chip profiling: real output fetches (np.asarray), k-vs-2k
marginal of device-chained iterations.  block_until_ready is NOT trusted
through the axon tunnel (it can return before device completion — see
bench.py); every timing fetches the result.

Usage: python scripts/profile2.py [section ...]
Sections: permute sponge merkle mul ntt fourstep bitrev
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

from plonky2_goldibear_tpu.field import gl, fft as jfft
from plonky2_goldibear_tpu.field.gl import GL
from plonky2_goldibear_tpu.ops import poseidon_gl as kp
from plonky2_goldibear_tpu.ops import ntt as kntt
from plonky2_goldibear_tpu.hash import merkle


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
    """Build run(lo, hi, k): k data-dependent reps of step inside one jit."""

    @functools.partial(jax.jit, static_argnames=("kk",))
    def run(lo, hi, kk):
        def body(_, st):
            r = step(GL(st[0], st[1]))
            return (r.lo[: st[0].shape[0]], r.hi[: st[0].shape[0]])

        return jax.lax.fori_loop(0, kk, body, (lo, hi))

    return run


def sec_permute():
    n = 1 << 16
    rng = np.random.default_rng(0)
    x = gl.from_ints(rng.integers(0, gl.P, size=(12, n), dtype=np.uint64))
    for tile in (2048, 4096, 8192):
        run = chain(lambda st: kp.permute_cols(st, tile=tile))
        dt = marginal(run, (x.lo, x.hi), 8)
        print(json.dumps({f"permute_t{tile}_Mperms_s": round(n / dt / 1e6, 1)}),
              flush=True)


def sec_sponge():
    n = 1 << 13
    leaf_len = 135
    rng = np.random.default_rng(0)
    x = gl.from_ints(rng.integers(0, gl.P, size=(leaf_len, n),
                                  dtype=np.uint64))
    perms = -(-leaf_len // 8)

    def step(st):
        d = kp.hash_cols_no_pad(st)
        lo = st.lo.at[:4].set(d.lo)
        hi = st.hi.at[:4].set(d.hi)
        return GL(lo, hi)

    run = chain(step)
    dt = marginal(run, (x.lo, x.hi), 8)
    print(json.dumps({"sponge_Mperms_s": round(n * perms / dt / 1e6, 1),
                      "sponge_ms": round(dt * 1e3, 3)}), flush=True)


def sec_merkle():
    n_leaves = 1 << 13
    leaf_len = 135
    num_layers = 13 - 4
    rng = np.random.default_rng(0)
    leaves = gl.from_ints(rng.integers(0, gl.P, size=(n_leaves, leaf_len),
                                       dtype=np.uint64))

    @functools.partial(jax.jit, static_argnames=("kk",))
    def run(lo, hi, kk):
        def body(_, carry):
            clo, chi = carry
            levels = merkle.build_levels(GL(clo, chi), num_layers)
            cap = levels[-1]
            clo = clo ^ (cap.lo[0, 0] & 1)
            return (clo, chi)

        return jax.lax.fori_loop(0, kk, body, (lo, hi))

    dt = marginal(run, (leaves.lo, leaves.hi), 16)
    perms_per_leaf = -(-leaf_len // 8)
    total = n_leaves * perms_per_leaf + n_leaves - 16
    print(json.dumps({"merkle_Mperms_s": round(total / dt / 1e6, 1),
                      "merkle_ms": round(dt * 1e3, 3)}), flush=True)

    # internal levels only (two_to_one rounds, no leaf sponge)
    caps = gl.from_ints(rng.integers(0, gl.P, size=(n_leaves, 4),
                                     dtype=np.uint64))

    @functools.partial(jax.jit, static_argnames=("kk",))
    def run2(lo, hi, kk):
        def body(_, carry):
            clo, chi = carry
            cur = GL(clo, chi)
            levels = [cur]
            for _ in range(num_layers):
                c = levels[-1]
                levels.append(merkle.poseidon_gl.two_to_one(c[0::2], c[1::2]))
            cap = levels[-1]
            clo = clo ^ (cap.lo[0, 0] & 1)
            return (clo, chi)

        return jax.lax.fori_loop(0, kk, body, (lo, hi))

    dt2 = marginal(run2, (caps.lo, caps.hi), 16)
    print(json.dumps({"merkle_internal_ms": round(dt2 * 1e3, 3),
                      "internal_Mperms_s": round((n_leaves - 16) / dt2 / 1e6, 1)
                      }), flush=True)


def _mulchain_kernel(lo_ref, hi_ref, o_lo, o_hi, *, reps):
    x = GL(lo_ref[:], hi_ref[:])
    y = x
    for _ in range(reps):
        y = kp._mul(y, x)
    o_lo[:] = y.lo
    o_hi[:] = y.hi


def sec_mul():
    n = 1 << 16
    reps = 64
    rng = np.random.default_rng(0)
    shape = (n // 512, 512)
    x = gl.from_ints(rng.integers(0, gl.P, size=shape, dtype=np.uint64))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(shape, jnp.uint32)

    def call(lo, hi):
        return pl.pallas_call(
            functools.partial(_mulchain_kernel, reps=reps),
            in_specs=[spec, spec], out_specs=(spec, spec),
            out_shape=(osh, osh))(lo, hi)

    @functools.partial(jax.jit, static_argnames=("kk",))
    def run(lo, hi, kk):
        def body(_, st):
            return call(st[0], st[1])

        return jax.lax.fori_loop(0, kk, body, (lo, hi))

    dt = marginal(run, (x.lo, x.hi), 4)
    per_mul = dt / (n * reps)
    print(json.dumps({"gl_mul_G_per_s": round(1e-9 / per_mul, 2)}), flush=True)


def sec_ntt():
    # fused kernel at the four-step inner shape: 4096 polys x 4096
    rng = np.random.default_rng(0)
    for (b, nl) in ((4096, 12), (64, 16), (16, 16)):
        n = 1 << nl
        x = gl.from_ints(rng.integers(0, gl.P, size=(b, n), dtype=np.uint64))
        run = chain(lambda st: kntt.fft(st))
        dt = marginal(run, (x.lo, x.hi), 2)
        print(json.dumps({f"ntt_b{b}_n2e{nl}_Melems_s":
                          round(b * n / dt / 1e6, 1),
                          f"ntt_b{b}_n2e{nl}_ms": round(dt * 1e3, 2)}),
              flush=True)


def sec_fourstep():
    n = 1 << 24
    rng = np.random.default_rng(1)
    x = gl.from_ints(rng.integers(0, gl.P, size=(1, n), dtype=np.uint64))
    run = chain(lambda st: kntt.fft(st))
    dt = marginal(run, (x.lo, x.hi), 2)
    print(json.dumps({"fourstep_2e24_Melems_s": round(n / dt / 1e6, 1),
                      "fourstep_2e24_ms": round(dt * 1e3, 1)}), flush=True)


def sec_bitrev():
    # cost of reverse_index_bits + transposes at 2^24-ish shapes
    rng = np.random.default_rng(1)
    x = gl.from_ints(rng.integers(0, gl.P, size=(4096, 4096),
                                  dtype=np.uint64))
    run = chain(lambda st: jfft.reverse_index_bits(st, axis=-1))
    dt = marginal(run, (x.lo, x.hi), 4)
    print(json.dumps({"bitrev_4096x4096_ms": round(dt * 1e3, 2)}), flush=True)

    run2 = chain(lambda st: GL(st.lo.T, st.hi.T))
    dt2 = marginal(run2, (x.lo, x.hi), 4)
    print(json.dumps({"transpose_4096x4096_ms": round(dt2 * 1e3, 2)}),
          flush=True)


ALL = {"permute": sec_permute, "sponge": sec_sponge, "merkle": sec_merkle,
       "mul": sec_mul, "ntt": sec_ntt, "fourstep": sec_fourstep,
       "bitrev": sec_bitrev}


def main():
    names = sys.argv[1:] or list(ALL)
    for nm in names:
        ALL[nm]()


if __name__ == "__main__":
    main()
