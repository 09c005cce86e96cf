"""On-chip Poseidon kernel profiling: where do the cycles go?

Measures (device-chained timing, tunnel-proof):
  1. permute_cols throughput at several tiles
  2. hash_cols_no_pad (leaf sponge) throughput
  3. raw GL-mul chain throughput inside a pallas kernel (the VPU cost model:
     ns per lazy 64x64 mod-p multiply per lane)
  4. an x^7 sbox chain (the sbox-only ceiling)
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


def _t(run, args, k):
    # block_until_ready is NOT trustworthy through the axon tunnel (it can
    # return at dispatch-ack time, yielding absurd throughputs); every
    # timing must FETCH real output bytes.  Outputs are pre-sliced small.
    t0 = time.perf_counter()
    _fetch(run(*args, k))
    return time.perf_counter() - t0


def marginal(run, args, k):
    _fetch(run(*args, k))
    _fetch(run(*args, 2 * k))
    t1 = min(_t(run, args, k) for _ in range(3))
    t2 = min(_t(run, args, 2 * k) for _ in range(3))
    if t2 <= t1:
        return t2 / (2 * k)
    return (t2 - t1) / k


def bench_permute(n, tile, k=8):
    rng = np.random.default_rng(0)
    x = gl.from_ints(rng.integers(0, gl.P, size=(12, n), dtype=np.uint64))

    @jax.jit
    def run(lo, hi, kk):
        def body(_, st):
            r = kp.permute_cols(GL(st[0], st[1]), tile=tile)
            return (r.lo, r.hi)
        lo, hi = jax.lax.fori_loop(0, kk, body, (lo, hi))
        return lo[:, :128], hi[:, :128]   # tiny fetch (tunnel-proof)

    dt = marginal(run, (x.lo, x.hi), k)
    return n / dt


def bench_sponge(n, leaf_len=135, k=4):
    rng = np.random.default_rng(0)
    x = gl.from_ints(rng.integers(0, gl.P, size=(leaf_len, n),
                                  dtype=np.uint64))
    perms = -(-leaf_len // 8)

    @jax.jit
    def run(lo, hi, kk):
        def body(_, st):
            lo2, hi2 = st
            d = kp.hash_cols_no_pad(GL(lo2, hi2))
            # feed digests back to keep data dependency
            lo3 = lo2.at[:4].set(d.lo)
            hi3 = hi2.at[:4].set(d.hi)
            return (lo3, hi3)
        lo, hi = jax.lax.fori_loop(0, kk, body, (lo, hi))
        return lo[:4, :128], hi[:4, :128]   # tiny fetch (tunnel-proof)

    dt = marginal(run, (x.lo, x.hi), k)
    return n * perms / dt


def _mulchain_kernel(lo_ref, hi_ref, o_lo, o_hi, *, reps):
    x = GL(lo_ref[:], hi_ref[:])
    y = x
    for _ in range(reps):
        y = kp._mul(y, x)
    o_lo[:] = y.lo
    o_hi[:] = y.hi


def bench_mulchain(n=65536, reps=64, k=8):
    """ns per lazy GL mul per lane, from a reps-deep dependent chain."""
    rng = np.random.default_rng(0)
    shape = (8, n // 8)
    x = gl.from_ints(rng.integers(0, gl.P, size=shape, dtype=np.uint64))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(shape, jnp.uint32)

    def call(lo, hi, reps):
        return pl.pallas_call(
            functools.partial(_mulchain_kernel, reps=reps),
            in_specs=[spec, spec], out_specs=(spec, spec),
            out_shape=(osh, osh))(lo, hi)

    @jax.jit
    def run(lo, hi, kk):
        def body(_, st):
            return call(st[0], st[1], reps)
        return jax.lax.fori_loop(0, kk, body, (lo, hi))

    dt = marginal(run, (x.lo, x.hi), k)
    return n * reps / dt        # muls/s


def _sboxchain_kernel(lo_ref, hi_ref, o_lo, o_hi, *, reps):
    x = GL(lo_ref[:], hi_ref[:])
    for _ in range(reps):
        x = kp._sbox(x)
    o_lo[:] = x.lo
    o_hi[:] = x.hi


def bench_sboxchain(n=65536, reps=16, k=8):
    rng = np.random.default_rng(0)
    shape = (8, n // 8)
    x = gl.from_ints(rng.integers(0, gl.P, size=shape, dtype=np.uint64))
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    osh = jax.ShapeDtypeStruct(shape, jnp.uint32)

    def call(lo, hi):
        return pl.pallas_call(
            functools.partial(_sboxchain_kernel, reps=reps),
            in_specs=[spec, spec], out_specs=(spec, spec),
            out_shape=(osh, osh))(lo, hi)

    @jax.jit
    def run(lo, hi, kk):
        def body(_, st):
            return call(st[0], st[1])
        return jax.lax.fori_loop(0, kk, body, (lo, hi))

    dt = marginal(run, (x.lo, x.hi), k)
    return n * reps / dt        # sboxes/s


def bench_tree(n_leaves=1 << 13, leaf_len=135, cap_height=4, k=8):
    """Full build_levels (the bench.py workload): perms/s including the
    two_to_one internal levels — compare against bench_sponge to see how
    much the small upper levels cost."""
    from plonky2_goldibear_tpu.hash import merkle

    rng = np.random.default_rng(0)
    leaves = gl.from_ints(rng.integers(0, gl.P, size=(n_leaves, leaf_len),
                                       dtype=np.uint64))
    num_layers = int(np.log2(n_leaves)) - cap_height

    @jax.jit
    def run(lo, hi, kk):
        def body(_, st):
            clo, chi = st
            cap = merkle.build_levels(GL(clo, chi), num_layers)[-1]
            clo = clo ^ (cap.lo[0, 0] & 1)
            return (clo, chi)
        lo, hi = jax.lax.fori_loop(0, kk, body, (lo, hi))
        cap = merkle.build_levels(GL(lo, hi), num_layers)[-1]
        return cap.lo, cap.hi

    perms = n_leaves * (-(-leaf_len // 8)) + n_leaves - (1 << cap_height)
    dt = marginal(run, (leaves.lo, leaves.hi), k)
    return perms / dt


def main():
    out = {}
    v = bench_mulchain()
    out["gl_mul_G_per_s"] = round(v / 1e9, 2)
    print(json.dumps({"gl_mul_G_per_s": out["gl_mul_G_per_s"]}), flush=True)
    v = bench_sboxchain()
    out["sbox_G_per_s"] = round(v / 1e9, 3)
    print(json.dumps({"sbox_G_per_s": out["sbox_G_per_s"]}), flush=True)
    # small tiles keep each (12, tile) op array in few vector registers —
    # if the 30-round chain is spill-bound, small tiles should win big
    for tile in (128, 256, 512, 1024, 2048, 4096):
        v = bench_permute(1 << 16, tile)
        out[f"permute_t{tile}"] = round(v / 1e6, 1)
        print(json.dumps({f"permute_t{tile}_Mperms_s": out[f"permute_t{tile}"]}),
              flush=True)
    v = bench_sponge(1 << 13)
    out["sponge_2e13x135"] = round(v / 1e6, 1)
    print(json.dumps({"sponge_Mperms_s": out["sponge_2e13x135"]}), flush=True)
    v = bench_tree()
    out["tree_2e13x135"] = round(v / 1e6, 1)
    print(json.dumps({"tree_Mperms_s": out["tree_2e13x135"]}), flush=True)
    # model: perms/s implied by sbox throughput alone (118 sboxes/perm,
    # 96 of them in full rounds at 12 lanes + 22 partial at ~1 lane)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
