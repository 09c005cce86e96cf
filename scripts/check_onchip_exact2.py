"""Second on-chip exactness audit: the EXACT kernel shapes of a 2^9-row
standard-recursion-config GL prove (the smallest failing TPU repro), which
the first audit (check_onchip_exact.py) did not cover — small-n boundaries
(n=256 is the pallas dispatch floor, n=512/4096 the repro's NTT sizes),
odd batch counts (85/135/20/16 polys), the zero-prefix=3 LDE path, the
ifft index-reversal path, and small Merkle trees.
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

from plonky2_goldibear_tpu.field import fft as fftm
from plonky2_goldibear_tpu.field import gl
from plonky2_goldibear_tpu.field.gl import GL
import plonky2_goldibear_tpu.hash.poseidon_gl as H
from plonky2_goldibear_tpu.hash import merkle

FAILS = []


def check(name, got, want):
    g = np.stack([np.asarray(got.lo), np.asarray(got.hi)])
    w = np.stack([np.asarray(want.lo), np.asarray(want.hi)])
    ok = bool((g == w).all())
    print(("PASS " if ok else "FAIL ") + name, flush=True)
    if not ok:
        FAILS.append(name)
        bad = np.argwhere((g != w).any(axis=0))
        print("  first bad idx:", bad[:4].tolist(), flush=True)
    return ok


def jnp_fft(x, zero_prefix_log=0):
    old = fftm.FORCE_JNP
    fftm.FORCE_JNP = True
    try:
        return fftm.fft(gl, x, zero_prefix_log=zero_prefix_log)
    finally:
        fftm.FORCE_JNP = old


def jnp_ifft(x):
    old = fftm.FORCE_JNP
    fftm.FORCE_JNP = True
    try:
        return fftm.ifft(gl, x)
    finally:
        fftm.FORCE_JNP = old


def main():
    rng = np.random.default_rng(3)
    print("backend:", jax.default_backend(), flush=True)

    from plonky2_goldibear_tpu.ops import ntt as NTT

    # forward NTT at repro sizes, incl. the pallas floor n=256.  NOTE the
    # 2^9-row repro actually pads to degree 2^10 (build gates), so its true
    # NTT shapes are (84|135|20, 1024) r=0 and (…, 8192) r=3 — the round-3
    # version of this audit only covered 512/4096 and missed them (the
    # lazy-sub bug was at (84, 1024); see tests/test_ops_kernels.py
    # test_ntt_lazy_sub_regression).
    for b, n, r in [(85, 256, 0), (85, 512, 0), (135, 512, 0), (20, 512, 0),
                    (85, 1 << 12, 3), (135, 1 << 12, 3), (20, 1 << 12, 3),
                    (16, 1 << 12, 0), (2, 256, 0), (4, 1 << 12, 3),
                    (84, 1 << 10, 0), (135, 1 << 10, 0), (20, 1 << 10, 0),
                    (84, 1 << 13, 3), (135, 1 << 13, 3), (20, 1 << 13, 3)]:
        if r:
            small = rng.integers(0, gl.P, size=(b, n >> r), dtype=np.uint64)
            x = np.concatenate(
                [small, np.zeros((b, n - (n >> r)), dtype=np.uint64)], axis=1)
        else:
            x = rng.integers(0, gl.P, size=(b, n), dtype=np.uint64)
        g = gl.from_ints(x)
        got = jax.jit(lambda v, r=r: fftm.fft(gl, v, zero_prefix_log=r))(g)
        want = jax.jit(lambda v, r=r: jnp_fft(v, zero_prefix_log=r))(g)
        check(f"fft b{b} n{n} zp{r}", got, want)

    # inverse NTT (values -> coeffs) at repro sizes
    for b, n in [(135, 512), (85, 512), (20, 512), (16, 1 << 12), (2, 256)]:
        x = rng.integers(0, gl.P, size=(b, n), dtype=np.uint64)
        g = gl.from_ints(x)
        got = jax.jit(lambda v: fftm.ifft(gl, v))(g)
        want = jax.jit(jnp_ifft)(g)
        check(f"ifft b{b} n{n}", got, want)

    # coset fft/ifft as the prover uses them (shift = multiplicative gen)
    from plonky2_goldibear_tpu.field import host
    shift = host.GOLDILOCKS.coset_shift
    for b, n in [(16, 1 << 12), (85, 1 << 12)]:
        x = rng.integers(0, gl.P, size=(b, n), dtype=np.uint64)
        g = gl.from_ints(x)
        got = jax.jit(lambda v: fftm.coset_ifft(gl, v, shift))(g)
        old = fftm.FORCE_JNP
        fftm.FORCE_JNP = True
        try:
            want = jax.jit(lambda v: fftm.coset_ifft(gl, v, shift))(g)
        finally:
            fftm.FORCE_JNP = old
        check(f"coset_ifft b{b} n{n}", got, want)

    # sponge at repro leaf shapes (cols layout) incl. narrow leaves
    from plonky2_goldibear_tpu.ops import poseidon_gl as K
    for leaf_len, n in [(85, 1 << 12), (135, 1 << 12), (20, 1 << 12),
                        (16, 1 << 12), (4, 1 << 12), (8, 256)]:
        leaves = rng.integers(0, gl.P, size=(leaf_len, n), dtype=np.uint64)
        got = K.hash_cols_no_pad(gl.from_ints(leaves))
        gi = gl.to_ints(got)
        ok = True
        for c in [0, 1, n // 2, n - 1]:
            want = H.hash_n_to_m_no_pad_host(
                [int(v) for v in leaves[:, c]], 4)
            ok = ok and list(gi[:, c]) == list(want)
        print(("PASS " if ok else "FAIL ") + f"sponge L{leaf_len} n{n}",
              flush=True)
        if not ok:
            FAILS.append(f"sponge L{leaf_len} n{n}")

    # full tree at repro sizes (n=4096 cap4; n=256 boundary cap4).
    # The reference levels are built with the Poseidon Pallas kernels
    # DISABLED so the comparison is kernel vs the jnp semantic reference —
    # otherwise H.two_to_one at batch>=128 dispatches to the same
    # permute_cols kernel and a shared kernel bug passes silently.
    for n, num_layers in [(1 << 12, 8), (256, 4), (512, 5)]:
        d0 = gl.from_ints(rng.integers(0, gl.P, size=(n, 4),
                                       dtype=np.uint64))
        got_levels = jax.jit(
            lambda d, nl=num_layers: merkle.build_levels(d, nl))(d0)
        os.environ["PLONKY2_TPU_DISABLE_POSEIDON"] = "1"
        try:
            ref = [d0]
            for _ in range(num_layers):
                cur = ref[-1]
                ref.append(H.two_to_one(cur[0::2], cur[1::2]))
        finally:
            os.environ.pop("PLONKY2_TPU_DISABLE_POSEIDON", None)
        for k, (lg, lw) in enumerate(zip(got_levels[1:], ref[1:])):
            check(f"tree n{n} level {k+1}", lg, lw)

    print(("ALL PASS" if not FAILS else f"FAILURES: {FAILS}"), flush=True)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
