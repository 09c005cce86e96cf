"""Pallas ops/ kernels vs the pure-jnp reference paths (interpret mode).

The kernels must be bit-exact drop-ins for the jnp twins they replace
(hash/poseidon_gl.py device path); on-chip equality is additionally covered
by the bench driver.  Mirrors the reference's consistency discipline
(poseidon_goldilocks.rs:1196 scalar-vs-optimized `consistency` test).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from plonky2_goldibear_tpu.field import gl
from plonky2_goldibear_tpu.hash import poseidon_gl as H


@pytest.fixture(scope="module", autouse=True)
def _interpret_mode():
    import plonky2_goldibear_tpu.ops.poseidon_gl as K

    old = K._INTERPRET
    K._INTERPRET = True
    yield
    K._INTERPRET = old


def test_permute_cols_matches_jnp():
    import plonky2_goldibear_tpu.ops.poseidon_gl as K

    rng = np.random.default_rng(0)
    state = rng.integers(0, gl.P, size=(12, 256), dtype=np.uint64)
    out = K.permute_cols(gl.from_ints(state), tile=128)
    ref = H.permute(gl.from_ints(state.T))
    np.testing.assert_array_equal(gl.to_ints(out), gl.to_ints(ref).T)


def test_permute_cols_folded_partial_sbox():
    """tile >= 1024 exercises the lane->sublane fold of the partial sbox."""
    import plonky2_goldibear_tpu.ops.poseidon_gl as K

    rng = np.random.default_rng(1)
    state = rng.integers(0, gl.P, size=(12, 1024), dtype=np.uint64)
    out = K.permute_cols(gl.from_ints(state), tile=1024)
    ref = H.permute(gl.from_ints(state.T))
    np.testing.assert_array_equal(gl.to_ints(out), gl.to_ints(ref).T)


def test_leaf_sponge_matches_jnp():
    import plonky2_goldibear_tpu.ops.poseidon_gl as K

    rng = np.random.default_rng(2)
    for leaf_len in (9, 16, 135):
        leaves = rng.integers(0, gl.P, size=(leaf_len, 128), dtype=np.uint64)
        dig = K.hash_cols_no_pad(gl.from_ints(leaves), tile=128)
        ref = H.hash_no_pad(gl.from_ints(leaves.T))
        np.testing.assert_array_equal(gl.to_ints(dig), gl.to_ints(ref).T)


def test_two_to_one_matches_jnp():
    import plonky2_goldibear_tpu.ops.poseidon_gl as K

    rng = np.random.default_rng(3)
    x = rng.integers(0, gl.P, size=(4, 128), dtype=np.uint64)
    y = rng.integers(0, gl.P, size=(4, 128), dtype=np.uint64)
    out = K.two_to_one_cols(gl.from_ints(x), gl.from_ints(y))
    ref = H.two_to_one(gl.from_ints(x.T), gl.from_ints(y.T))
    np.testing.assert_array_equal(gl.to_ints(out), gl.to_ints(ref).T)


def test_ntt_kernel_matches_jnp():
    import jax
    import plonky2_goldibear_tpu.ops.ntt as NTT
    from plonky2_goldibear_tpu.field import fft as fftm

    rng = np.random.default_rng(4)
    for b, n in [(1, 128), (2, 512), (1, 2048)]:
        x = rng.integers(0, gl.P, size=(b, n), dtype=np.uint64)
        g = gl.from_ints(x)
        out = NTT.fft(g)
        ref = fftm.fft(gl, g)
        np.testing.assert_array_equal(gl.to_ints(out), gl.to_ints(ref))


def test_ntt_lazy_sub_regression():
    """Round-3 on-TPU prove failure: gl.sub(a, m) with a = 0 and a lazy
    _mul output m in [p, 2^64) wrapped twice, corrupting 32 outputs of the
    constants-sigmas commit NTT (shape (84, 1024)) and failing the
    verifier's vanishing check at every circuit size.  Fixture = the actual
    failing sigma column captured from that prove (bisect matrix in round-4
    commit; fix: ops/ntt.py:_canon).  Random inputs hit the hazard with
    probability ~2^-32 per element, which is why the round-3 audits passed."""
    import os

    import plonky2_goldibear_tpu.ops.ntt as NTT

    z = np.load(os.path.join(os.path.dirname(__file__), "data",
                             "ntt_lazy_sub_regression.npz"))
    x = gl.GL(jnp.asarray(z["xlo"][None]), jnp.asarray(z["xhi"][None]))
    out = NTT.fft(x)
    np.testing.assert_array_equal(np.asarray(out.lo)[0], z["olo"])
    np.testing.assert_array_equal(np.asarray(out.hi)[0], z["ohi"])


def test_ntt_bb_kernel_matches_jnp():
    """BabyBear fused NTT (ops/ntt_bb.py) vs the jnp path — Montgomery
    residues are bit-identical (integer NTTs are exact).  Includes the
    pad path (rows_per_poly < 8) and zero-prefix LDE stages."""
    from plonky2_goldibear_tpu.field import bb
    from plonky2_goldibear_tpu.field import fft as fftm
    import plonky2_goldibear_tpu.ops.ntt_bb as NTTB

    rng = np.random.default_rng(11)
    for b, n in [(1, 128), (3, 512), (2, 2048)]:
        x = bb.from_ints(rng.integers(0, bb.P, size=(b, n), dtype=np.uint64))
        out = NTTB.fft(x)
        ref = fftm._fft_jnp(bb, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # zero-prefix (LDE) path
    b, n, r = 2, 1024, 3
    c = rng.integers(0, bb.P, size=(b, n >> r), dtype=np.uint64)
    padded = np.concatenate(
        [c, np.zeros((b, n - (n >> r)), dtype=np.uint64)], axis=1)
    xm = bb.from_ints(padded)
    out = NTTB.fft(xm, zero_prefix_log=r)
    ref = fftm._fft_jnp(bb, xm)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_poseidon2_bb_permute_cols_matches_jnp():
    """BB Poseidon2 width-16 Pallas kernel vs the jnp reference permute and
    the host KAT path (Montgomery residues bit-identical)."""
    from plonky2_goldibear_tpu.field import bb
    from plonky2_goldibear_tpu.hash import poseidon2_bb as H2
    import plonky2_goldibear_tpu.ops.poseidon2_bb as K2

    rng = np.random.default_rng(12)
    vals = rng.integers(0, bb.P, size=(256, H2.WIDTH), dtype=np.uint64)
    state = bb.from_ints(vals)
    got = K2.permute_cols(state.reshape(256, H2.WIDTH).T).T
    ref = H2.permute(state)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # spot-check two columns against the host evaluation
    for c in (0, 255):
        want = H2.permute_host([int(v) for v in vals[c]])
        assert [int(v) for v in bb.to_ints(got[c])] == want


def test_ntt_kernel_zero_prefix():
    import plonky2_goldibear_tpu.ops.ntt as NTT
    from plonky2_goldibear_tpu.field import fft as fftm

    rng = np.random.default_rng(5)
    b, n, r = 2, 128, 3
    c = rng.integers(0, gl.P, size=(b, n), dtype=np.uint64)
    padded = np.concatenate(
        [c, np.zeros((b, n * ((1 << r) - 1)), dtype=np.uint64)], axis=1)
    out = NTT.fft(gl.from_ints(padded), zero_prefix_log=r)
    ref = fftm.fft(gl, gl.from_ints(padded))
    np.testing.assert_array_equal(gl.to_ints(out), gl.to_ints(ref))


def test_tree_levels_cols_matches_jnp():
    """Fused bit-reversed tree build vs the generic two_to_one loop."""
    import plonky2_goldibear_tpu.ops.poseidon_gl as K
    from plonky2_goldibear_tpu.hash import merkle

    rng = np.random.default_rng(9)
    n, leaf_len, num_layers = 1024, 7, 6   # tail kernel covers all levels
    leaves = gl.from_ints(
        rng.integers(0, gl.P, size=(n, leaf_len), dtype=np.uint64))
    d0 = H.hash_or_noop(leaves)
    got = K.build_levels_cols(d0, num_layers)
    ref = [d0]
    for _ in range(num_layers):
        cur = ref[-1]
        ref.append(H.two_to_one(cur[0::2], cur[1::2]))
    assert len(got) == num_layers
    for lv_got, lv_ref in zip(got, ref[1:]):
        np.testing.assert_array_equal(gl.to_ints(lv_got), gl.to_ints(lv_ref))


def test_tree_levels_cols_mixed_grid_and_tail():
    """n large enough that grid-level two_to_one runs before the tail."""
    import plonky2_goldibear_tpu.ops.poseidon_gl as K

    rng = np.random.default_rng(10)
    n, num_layers = 2048, 8
    d0 = gl.from_ints(rng.integers(0, gl.P, size=(n, 4), dtype=np.uint64))
    got = K.build_levels_cols(d0, num_layers)
    ref = [d0]
    for _ in range(num_layers):
        cur = ref[-1]
        ref.append(H.two_to_one(cur[0::2], cur[1::2]))
    for lv_got, lv_ref in zip(got, ref[1:]):
        np.testing.assert_array_equal(gl.to_ints(lv_got), gl.to_ints(lv_ref))


def test_ntt_mxu_matches_jnp():
    """MXU digit-plane NTT vs the jnp reference, several shapes/radix plans."""
    import plonky2_goldibear_tpu.ops.ntt_mxu as M
    from plonky2_goldibear_tpu.field import fft as fftm

    rng = np.random.default_rng(6)
    for b, n in [(1, 64), (3, 128), (2, 512), (1, 4096), (1, 1 << 13)]:
        x = rng.integers(0, gl.P, size=(b, n), dtype=np.uint64)
        g = gl.from_ints(x)
        out = M.fft(g)
        ref = fftm.fft(gl, g)
        np.testing.assert_array_equal(gl.to_ints(out), gl.to_ints(ref))


def test_ntt_mxu_zero_prefix():
    import plonky2_goldibear_tpu.ops.ntt_mxu as M
    from plonky2_goldibear_tpu.field import fft as fftm

    rng = np.random.default_rng(7)
    for b, n, r in [(2, 256, 3), (1, 2048, 3), (1, 512, 1)]:
        c = rng.integers(0, gl.P, size=(b, n), dtype=np.uint64)
        padded = np.concatenate(
            [c, np.zeros((b, n * ((1 << r) - 1)), dtype=np.uint64)], axis=1)
        out = M.fft(gl.from_ints(padded), zero_prefix_log=r)
        ref = fftm.fft(gl, gl.from_ints(padded))
        np.testing.assert_array_equal(gl.to_ints(out), gl.to_ints(ref))


def test_ntt_mxu_noncanonical_input():
    """The MXU path accepts any u64 input (lazy values from prior stages)."""
    import plonky2_goldibear_tpu.ops.ntt_mxu as M
    from plonky2_goldibear_tpu.field import fft as fftm

    rng = np.random.default_rng(8)
    raw = rng.integers(0, 2**64 - 1, size=(2, 128), dtype=np.uint64)
    x = gl.GL(jnp.asarray((raw & 0xFFFFFFFF).astype(np.uint32)),
              jnp.asarray((raw >> np.uint64(32)).astype(np.uint32)))
    canon = gl.from_ints(raw % gl.P)
    out = M.fft(x)
    ref = fftm.fft(gl, canon)
    np.testing.assert_array_equal(gl.to_ints(out), gl.to_ints(ref))
