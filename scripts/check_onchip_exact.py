"""On-chip bit-exactness audit: every ops/ kernel vs its pure-jnp reference,
at PROVER-REALISTIC shapes, on the real TPU (interpret-mode tests can miss
real Mosaic miscompiles).  Prints PASS/FAIL per case.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from plonky2_goldibear_tpu.field import gl, fft as fftm
from plonky2_goldibear_tpu.field.gl import GL
from plonky2_goldibear_tpu.hash import poseidon_gl as H


def check(name, got, want):
    g = gl.to_ints(got) if isinstance(got, GL) else np.asarray(got)
    w = gl.to_ints(want) if isinstance(want, GL) else np.asarray(want)
    ok = bool(np.array_equal(g, w))
    print(("PASS " if ok else "FAIL ") + name, flush=True)
    if not ok:
        bad = np.argwhere(g != w)
        print("  first diffs:", bad[:4].tolist(),
              [hex(int(g[tuple(i)])) for i in bad[:2]],
              [hex(int(w[tuple(i)])) for i in bad[:2]], flush=True)
    return ok


def jnp_fft(x, zero_prefix_log=0):
    old = fftm.FORCE_JNP
    fftm.FORCE_JNP = True
    try:
        return fftm.fft(gl, x, zero_prefix_log=zero_prefix_log)
    finally:
        fftm.FORCE_JNP = old


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)

    # --- fused NTT at prover shapes ---
    from plonky2_goldibear_tpu.ops import ntt as NTT
    for b, n, r in [(2, 1 << 12, 0), (135, 1 << 13, 0), (8, 1 << 16, 0),
                    (135, 1 << 16, 3), (3, 1 << 17, 0)]:
        if r:
            small = rng.integers(0, gl.P, size=(b, n >> r), dtype=np.uint64)
            x = np.concatenate(
                [small, np.zeros((b, n - (n >> r)), dtype=np.uint64)], axis=1)
        else:
            x = rng.integers(0, gl.P, size=(b, n), dtype=np.uint64)
        g = gl.from_ints(x)
        got = jax.jit(lambda v: NTT.fft(v, zero_prefix_log=r))(g)
        want = jax.jit(lambda v: jnp_fft(v, zero_prefix_log=r))(g)
        check(f"ntt b{b} n{n} zp{r}", got, want)

    # --- Poseidon kernels at prover batch sizes ---
    from plonky2_goldibear_tpu.ops import poseidon_gl as K
    for n in (1 << 12, 1 << 16):
        st = rng.integers(0, gl.P, size=(12, n), dtype=np.uint64)
        got = K.permute_cols(gl.from_ints(st))
        # jnp reference (row-major path, scan rounds)
        ref = jax.jit(lambda s: H._scan_rounds(
            H._scan_rounds(H._scan_rounds(s, H._RC_FULL0, H._full_round),
                           H._RC_PARTIAL, H._partial_round),
            H._RC_FULL1, H._full_round))(gl.from_ints(st.T))
        check(f"permute_cols n{n}", GL(got.lo.T, got.hi.T), ref)

    for leaf_len, n in [(135, 1 << 13), (84, 1 << 14), (16, 1 << 12)]:
        leaves = rng.integers(0, gl.P, size=(leaf_len, n), dtype=np.uint64)
        got = K.hash_cols_no_pad(gl.from_ints(leaves))
        # host reference on a few columns
        cols = [0, 1, n // 2, n - 1]
        import plonky2_goldibear_tpu.hash.poseidon_gl as hp
        ok = True
        gi = gl.to_ints(got)
        for c in cols:
            want = hp.hash_n_to_m_no_pad_host(
                [int(v) for v in leaves[:, c]], 4)
            ok = ok and list(gi[:, c]) == list(want)
        print(("PASS " if ok else "FAIL ") + f"sponge L{leaf_len} n{n}",
              flush=True)

    # --- fused tree levels vs generic loop, on chip ---
    n, num_layers = 1 << 13, 9
    d0 = gl.from_ints(rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64))
    got_levels = jax.jit(
        lambda d: K.build_levels_cols(d, num_layers))(d0)
    ref = [d0]
    for _ in range(num_layers):
        cur = ref[-1]
        ref.append(H.two_to_one(cur[0::2], cur[1::2]))
    allok = True
    for k, (lg, lw) in enumerate(zip(got_levels, ref[1:])):
        allok &= check(f"tree level {k+1}", lg, lw)


if __name__ == "__main__":
    main()
