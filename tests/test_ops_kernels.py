"""Pallas ops/ kernels vs the pure-jnp reference paths (interpret mode).

The kernels must be bit-exact drop-ins for the jnp twins they replace
(hash/poseidon_gl.py device path); on-chip equality is additionally covered
by the bench driver.  Mirrors the reference's consistency discipline
(poseidon_goldilocks.rs:1196 scalar-vs-optimized `consistency` test).
"""

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
